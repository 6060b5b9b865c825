"""Stage-2 of the H/32==2 spatial root-cause (VERDICT r3 #4): isolate the
offending op. debug_spatial_h64.py bisected the failure to layer4_0 — the
stride-2 BasicBlock whose INPUT height is 4 rows over a 4-device 'space'
axis (1 row/device) and whose output (2 rows) is SMALLER than the shard
count. This probes candidate ops at exactly those shapes, sharded vs not:

  A  conv 3x3 stride-2, H_in=4            (layer4_0.conv1's spatial case)
  B  conv 3x3 stride-1, H_in=2            (layer4_0.conv2's spatial case)
  C  A -> BN(train) -> relu
  D  full BasicBlock(stride=2) at H_in=4  (incl. 1x1 stride-2 downsample)
  E  D with loss = sum(y^2) after a second BasicBlock (stride 1)

Run: python scripts/debug_spatial_op.py [--space 4] [--dump-hlo PREFIX]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def compare(name, model, x, mesh, train=True, dump=None):
    from radar_depth_tpu.parallel.mesh import replicated_sharding

    repl = replicated_sharding(mesh)
    sh_in = NamedSharding(mesh, P("data", "space"))
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    has_stats = "batch_stats" in v

    def loss_fn(params, x):
        kw = dict(mutable=["batch_stats"]) if has_stats else {}
        out = model.apply(
            {"params": params, **({"batch_stats": v["batch_stats"]}
                                  if has_stats else {})}, x, train=train,
            **kw)
        y = out[0] if has_stats else out
        return jnp.sum(y.astype(jnp.float32) ** 2)

    grad = jax.grad(loss_fn)
    g_ref = jax.jit(grad)(v["params"], x)
    jit_sp = jax.jit(grad, in_shardings=(repl, sh_in), out_shardings=repl)
    g_sp = jit_sp(jax.device_put(v["params"], repl),
                  jax.device_put(x, sh_in))
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_sp = jax.tree_util.tree_leaves(g_sp)
    bad = []
    for (path, a), b in zip(flat_ref, flat_sp):
        ra = float(np.linalg.norm(np.asarray(b)) /
                   max(float(np.linalg.norm(np.asarray(a))), 1e-12))
        if not (0.99 < ra < 1.01):
            bad.append((jax.tree_util.keystr(path), ra))
    print(f"{name}: {'OK' if not bad else 'BAD'}" +
          "".join(f"\n    {r:8.3f}  {n}" for n, r in bad[:6]))
    if bad and dump:
        path = f"{dump}_{name.split()[0]}.hlo"
        with open(path, "w") as f:
            f.write(jit_sp.lower(jax.device_put(v["params"], repl),
                                 jax.device_put(x, sh_in))
                    .compile().as_text())
        print(f"    HLO -> {path}")
    return bool(bad)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--space", type=int, default=4)
    ap.add_argument("--dump-hlo", default="")
    args = ap.parse_args()

    from radar_depth_tpu.models.layers import make_norm
    from radar_depth_tpu.models.resnet import BasicBlock
    from radar_depth_tpu.parallel.mesh import make_spatial_mesh

    mesh = make_spatial_mesh(args.space)
    rng = np.random.default_rng(0)
    x4 = jnp.asarray(rng.random((4, 4, 3, 256)), jnp.float32)   # H_in=4
    x2 = jnp.asarray(rng.random((4, 2, 3, 512)), jnp.float32)   # H_in=2

    class Conv(nn.Module):
        stride: int = 2
        feats: int = 512

        @nn.compact
        def __call__(self, x, train=True):
            return nn.Conv(self.feats, (3, 3), strides=self.stride,
                           padding=1, use_bias=False)(x)

    class ConvConv(nn.Module):
        """s2 conv (H4->H2, now 2 rows over 4 shards) then s1 3x3 conv ON
        the sub-shard-count activation — the candidate culprit. The H=2
        intermediate can only exist INSIDE the jitted graph (device_put
        rejects non-divisible shardings), so the chain starts at H=4."""

        @nn.compact
        def __call__(self, x, train=True):
            y = nn.Conv(512, (3, 3), strides=2, padding=1,
                        use_bias=False)(x)
            return nn.Conv(512, (3, 3), strides=1, padding=1,
                           use_bias=False)(y)

    class ConvBN(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            y = nn.Conv(512, (3, 3), strides=2, padding=1,
                        use_bias=False)(x)
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9)(y)
            return nn.relu(y)

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return BasicBlock(512, stride=2, norm=make_norm())(x, train)

    class TwoBlocks(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            y = BasicBlock(512, stride=2, norm=make_norm())(x, train)
            return BasicBlock(512, stride=1, norm=make_norm())(y, train)

    del x2
    compare("A conv3x3-s2 Hin4", Conv(stride=2), x4, mesh,
            dump=args.dump_hlo or None)
    compare("B s2conv-s1conv Hin4", ConvConv(), x4, mesh,
            dump=args.dump_hlo or None)
    compare("C conv-bn-relu-s2 Hin4", ConvBN(), x4, mesh,
            dump=args.dump_hlo or None)
    compare("D basicblock-s2 Hin4", Block(), x4, mesh,
            dump=args.dump_hlo or None)
    compare("E two-blocks Hin4", TwoBlocks(), x4, mesh,
            dump=args.dump_hlo or None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
