"""Root-cause the H/32==2 spatial-backward mis-partitioning (VERDICT r3 #4).

tests/test_spatial.py measured: with image height sharded over a 4-device
'space' axis, the full train micro-step's encoder-side gradients inflate
~4x per reduction stage at H=64 (bottleneck H/32 = 2 rows) while
H in {96,128,160} are exact. This script bisects the failure:

  stage 1: encoder-prefix bisection — loss = sum(prefix(x)) for prefixes
           stem, stem+layer1, ..., stem+layer4 (+BN train mode), comparing
           sharded-vs-unsharded gradients per prefix. Finds the first
           graph suffix whose backward mis-partitions.
  stage 2: dump the partitioned-HLO for the failing prefix and grep the
           collectives (all-reduce / collective-permute) feeding the
           offending gradient.

Run on the 8-fake-device CPU backend:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/debug_spatial_h64.py [--height 64] [--space 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--space", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--train-mode", action="store_true", default=True)
    ap.add_argument("--dump-hlo", default="",
                    help="dump partitioned HLO of the failing prefix here")
    args = ap.parse_args()

    from radar_depth_tpu.models.resnet import ResNetEncoder
    from radar_depth_tpu.parallel.mesh import (
        make_spatial_mesh, replicated_sharding)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, args.height, args.width, 3)),
                    jnp.float32)

    mesh = make_spatial_mesh(args.space)
    repl = replicated_sharding(mesh)
    sh_in = NamedSharding(mesh, P("data", "space"))

    from radar_depth_tpu.models.layers import max_pool_torch

    class Prefix(ResNetEncoder):
        n_blocks: int = 8  # resnet18: 2 blocks per stage x 4 stages

        def __call__(self, x, train):
            y = self.stem_finish(self.stem_conv(x), train)
            y = max_pool_torch(y, 3, 2, 1)
            for blk in self.blocks[:self.n_blocks]:
                y = blk(y, train)
            return y

    for n_blocks in range(0, 9):
        model = Prefix(n_blocks=n_blocks)
        v = model.init(jax.random.PRNGKey(0), x, train=True)

        def loss_fn(params, batch_stats, x):
            out, upd = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        grad = jax.grad(loss_fn)
        g_ref = jax.jit(grad)(v["params"], v["batch_stats"], x)
        sharded = jax.jit(
            grad,
            in_shardings=(repl, repl, sh_in),
            out_shardings=repl)
        g_sp = sharded(jax.device_put(v["params"], repl),
                       jax.device_put(v["batch_stats"], repl),
                       jax.device_put(x, sh_in))
        bad = []
        flat_ref, tdef = jax.tree_util.tree_flatten_with_path(g_ref)
        flat_sp = jax.tree_util.tree_leaves(g_sp)
        worst = (1.0, None)
        for (path, a), b in zip(flat_ref, flat_sp):
            ra = float(np.linalg.norm(np.asarray(b)) /
                       max(float(np.linalg.norm(np.asarray(a))), 1e-12))
            name = jax.tree_util.keystr(path)
            if not (0.98 < ra < 1.02):
                bad.append((name, ra))
            if abs(ra - 1) > abs(worst[0] - 1):
                worst = (ra, name)
        status = "OK " if not bad else "BAD"
        print(f"prefix stem+{n_blocks} blocks: {status} "
              f"worst ratio {worst[0]:.3f} at {worst[1]}")
        for name, ra in bad[:8]:
            print(f"    {ra:8.3f}  {name}")
        if bad and args.dump_hlo:
            lowered = jax.jit(grad, in_shardings=(repl, repl, sh_in),
                              out_shardings=repl).lower(
                v["params"], v["batch_stats"], x)
            txt = lowered.compile().as_text()
            with open(args.dump_hlo, "w") as f:
                f.write(txt)
            print(f"    partitioned HLO -> {args.dump_hlo} "
                  f"({len(txt.splitlines())} lines)")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
