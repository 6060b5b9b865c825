"""Print parameter counts and forward-pass FLOPs for any registry arch —
quick introspection for users picking a configuration (the reference offers
nothing comparable; closest is torchsummary by hand).

Usage:
  python scripts/model_summary.py                      # all archs, 450x800
  python scripts/model_summary.py --arch resnet18_multistage --height 224
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(arch: str, height: int, width: int, decoder: str = "upproj"):
    import jax
    import jax.numpy as jnp

    from radar_depth_tpu.models import create_model

    model, spec = create_model(arch, decoder=decoder,
                               output_size=(height, width))
    rgb = jnp.zeros((1, height, width, 3), jnp.float32)
    radar = jnp.zeros((1, height, width, 1), jnp.float32)
    if spec.input_kind == "late":
        inputs = (rgb, radar)
    else:
        inputs = (jnp.concatenate([rgb, radar], axis=-1),)
    variables = jax.eval_shape(
        lambda *a: model.init(jax.random.PRNGKey(0), *a, train=False), *inputs)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(variables["params"]))
    n_stats = sum(int(np.prod(x.shape))
                  for x in jax.tree_util.tree_leaves(
                      variables.get("batch_stats", {})))

    flops = None
    try:
        lowered = jax.jit(
            lambda v, *a: model.apply(v, *a, train=False)
        ).lower(variables, *inputs)
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops")
    except Exception:
        pass
    return n_params, n_stats, flops


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default=None, help="default: every registry arch")
    p.add_argument("--decoder", default="upproj")
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--no-flops", action="store_true",
                   help="skip compilation (params only; much faster)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # shape-eval only; no TPU need

    from radar_depth_tpu.models import ARCH_REGISTRY

    archs = [args.arch] if args.arch else sorted(ARCH_REGISTRY)
    print(f"{'arch':36s} {'params':>12s} {'bn stats':>10s} "
          f"{'fwd GFLOPs@B=1':>15s}")
    for arch in archs:
        if args.no_flops:
            n_params, n_stats, flops = *summarize_params_only(
                arch, args.height, args.width, args.decoder), None
        else:
            n_params, n_stats, flops = summarize(arch, args.height,
                                                 args.width, args.decoder)
        f = f"{flops / 1e9:14.1f}" if flops else "            n/a"
        print(f"{arch:36s} {n_params:12,d} {n_stats:10,d} {f}")
    return 0


def summarize_params_only(arch, height, width, decoder):
    import jax
    import jax.numpy as jnp

    from radar_depth_tpu.models import create_model

    model, spec = create_model(arch, decoder=decoder,
                               output_size=(height, width))
    rgb = jnp.zeros((1, height, width, 3), jnp.float32)
    radar = jnp.zeros((1, height, width, 1), jnp.float32)
    inputs = (rgb, radar) if spec.input_kind == "late" else (
        jnp.concatenate([rgb, radar], axis=-1),)
    variables = jax.eval_shape(
        lambda *a: model.init(jax.random.PRNGKey(0), *a, train=False), *inputs)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(variables["params"]))
    n_stats = sum(int(np.prod(x.shape))
                  for x in jax.tree_util.tree_leaves(
                      variables.get("batch_stats", {})))
    return n_params, n_stats


if __name__ == "__main__":
    sys.exit(main())
