"""torch state_dict ↔ flax variables conversion (SURVEY.md §7 step 3:
"pretrained-ImageNet story: ship a torch→jax weight converter"; also the
parity-test bridge to the torch oracle, §4 item 3).

Because oracle module names mirror the flax tree, conversion is pure
mechanics:
  flax params  a/b/c: kernel (kh,kw,I,O)  ← torch "a.b.c.weight" (O,I,kh,kw)
  conv-transpose (path leaf 'convt'): kernel (kh,kw,I,O) ← (I,O,kh,kw)
  BN scale/bias ← weight/bias; batch_stats mean/var ← running_mean/var

Also maps torchvision resnet{18,34} checkpoints (layer1.0.conv1 →
encoder/layer1_0/conv1) for ImageNet-pretrained encoders without network
access.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _flatten(tree: Dict, prefix=()) -> Dict[tuple, Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[tuple, Any]) -> Dict:
    out: Dict = {}
    for path, v in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return out


def torch_state_dict_to_variables(state_dict: Dict[str, Any],
                                  variables_template: Dict) -> Dict:
    """Fill a flax variables pytree {params, batch_stats} from a torch
    state_dict of the mirrored oracle model. Raises on any missing key, so
    conversion failures are loud."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out = {}
    for col in ("params", "batch_stats"):
        flat = _flatten(variables_template.get(col, {}))
        new_flat = {}
        for path, tmpl in flat.items():
            *mods, leaf = path
            base = ".".join(mods)
            if leaf == "kernel":
                w = sd[f"{base}.weight"]
                if mods[-1] == "convt":  # ConvTranspose2d: (I, O, kh, kw)
                    w = w.transpose(2, 3, 0, 1)
                else:  # Conv2d: (O, I, kh, kw) → (kh, kw, I, O)
                    w = w.transpose(2, 3, 1, 0)
            elif leaf == "scale":
                w = sd[f"{base}.weight"]
            elif leaf == "bias":
                w = sd[f"{base}.bias"]
            elif leaf == "mean":
                w = sd[f"{base}.running_mean"]
            elif leaf == "var":
                w = sd[f"{base}.running_var"]
            else:
                raise KeyError(f"unknown leaf {leaf} at {path}")
            if tuple(w.shape) != tuple(np.shape(tmpl)):
                raise ValueError(f"{path}: shape {w.shape} != {np.shape(tmpl)}")
            new_flat[path] = w.astype(np.float32)
        out[col] = _unflatten(new_flat)
    return out


def variables_to_torch_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Inverse direction (jax → torch oracle), used to export checkpoints."""
    sd: Dict[str, np.ndarray] = {}
    params = _flatten(variables.get("params", {}))
    stats = _flatten(variables.get("batch_stats", {}))
    for path, w in params.items():
        *mods, leaf = path
        base = ".".join(mods)
        w = np.asarray(w)
        if leaf == "kernel":
            if mods[-1] == "convt":
                sd[f"{base}.weight"] = w.transpose(2, 3, 0, 1)
            else:
                sd[f"{base}.weight"] = w.transpose(3, 2, 0, 1)
        elif leaf == "scale":
            sd[f"{base}.weight"] = w
        elif leaf == "bias":
            sd[f"{base}.bias"] = w
        else:
            raise KeyError(path)
    for path, w in stats.items():
        *mods, leaf = path
        base = ".".join(mods)
        key = {"mean": "running_mean", "var": "running_var"}[leaf]
        sd[f"{base}.{key}"] = np.asarray(w)
    return sd


def torchvision_resnet_to_encoder(state_dict: Dict[str, Any],
                                  encoder_template: Dict,
                                  encoder_stats_template: Dict) -> tuple:
    """torchvision resnet{18,34} state_dict → (params, batch_stats) for
    ResNetEncoder. torchvision names: conv1, bn1, layer{s}.{b}.{conv1,bn1,
    conv2,bn2,downsample.{0,1}} → ours: conv1, bn1, layer{s}_{b}/{...,
    downsample_conv, downsample_bn}."""
    renamed = {}
    for k, v in state_dict.items():
        k2 = k
        for s in range(1, 5):
            for b in range(0, 6):
                k2 = k2.replace(f"layer{s}.{b}.", f"layer{s}_{b}.")
        k2 = k2.replace("downsample_0", "downsample_conv").replace(
            "downsample_1", "downsample_bn")
        k2 = k2.replace(".downsample.0.", ".downsample_conv.").replace(
            ".downsample.1.", ".downsample_bn.")
        renamed[k2] = v
    tmpl = {"params": encoder_template, "batch_stats": encoder_stats_template}
    out = torch_state_dict_to_variables(renamed, tmpl)
    return out["params"], out["batch_stats"]


def graft_pretrained_encoders(params: Dict, batch_stats: Dict,
                              state_dict: Dict[str, Any]) -> tuple:
    """Graft a torchvision resnet{18,34} state_dict into every ResNet encoder
    subtree of a model (upstream:models.py pretrained=True semantics: all
    backbone weights come from ImageNet; a conv1 whose in_channels differs —
    4-ch early fusion, 1-ch radar branch — keeps its fresh init, SURVEY.md §2
    C7a).

    Returns (params, batch_stats, report) where report lists
    (subtree, loaded_count, skipped_leaves)."""
    # torchvision names → our names.
    renamed = {}
    for k, v in state_dict.items():
        if k.startswith("fc."):
            continue  # classifier head: not part of the encoder
        k2 = k
        for s in range(1, 5):
            for b in range(0, 6):
                k2 = k2.replace(f"layer{s}.{b}.", f"layer{s}_{b}.")
        k2 = k2.replace(".downsample.0.", ".downsample_conv.").replace(
            ".downsample.1.", ".downsample_bn.")
        renamed[k2] = np.asarray(v)

    def encoder_subtrees(tree, prefix=()):
        out = []
        for name, sub in tree.items():
            if not isinstance(sub, dict):
                continue
            if name.endswith("encoder") or name == "encoder":
                out.append(prefix + (name,))
            else:
                out.extend(encoder_subtrees(sub, prefix + (name,)))
        return out

    def get(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    def set_(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = value

    import copy

    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    report = []
    for path in encoder_subtrees(params):
        loaded, skipped = 0, []
        for col, tree in (("params", params), ("batch_stats", batch_stats)):
            try:
                sub = get(tree, path)
            except KeyError:
                continue
            flat = _flatten(sub)
            for leaf_path, tmpl in flat.items():
                *mods, leaf = leaf_path
                base = ".".join(mods)
                src_key = {
                    "kernel": f"{base}.weight",
                    "scale": f"{base}.weight",
                    "bias": f"{base}.bias",
                    "mean": f"{base}.running_mean",
                    "var": f"{base}.running_var",
                }[leaf]
                if src_key not in renamed:
                    skipped.append("/".join(leaf_path) + " (missing)")
                    continue
                w = renamed[src_key]
                if leaf == "kernel":
                    w = w.transpose(2, 3, 1, 0)
                if tuple(w.shape) != tuple(np.shape(tmpl)):
                    skipped.append("/".join(leaf_path) + " (shape)")
                    continue
                set_(tree, path + leaf_path[:-1] + (leaf,),
                     w.astype(np.float32))
                loaded += 1
        report.append(("/".join(path), loaded, skipped))
    return params, batch_stats, report
