"""CLI entry point (upstream:main.py::__main__; SURVEY.md §3.1/§3.2):

  train:     python -m radar_depth_tpu.train.main --arch resnet18_latefusion ...
  resume:    ... --resume runs/exp1
  evaluate:  ... --evaluate runs/exp1
"""

from __future__ import annotations

import sys

from radar_depth_tpu.config import parse_command
from radar_depth_tpu.train.loop import Trainer


def main(argv=None) -> int:
    cfg = parse_command(argv)
    if cfg.platform == "cpu":
        # Must land before first device use; the axon sitecustomize plugin
        # ignores JAX_PLATFORMS, so jax.config is the only reliable switch.
        import jax

        jax.config.update("jax_platforms", "cpu")
    from radar_depth_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    trainer = Trainer(cfg)
    if cfg.evaluate:
        trainer.load_for_evaluate()
        metrics = trainer.validate(epoch=0)
        print("validation:", {k: round(v, 4) for k, v in metrics.items()})
        if cfg.eval_splits:
            splits = trainer.validate_splits(epoch=0)
            if not splits:
                print("--eval-splits: val dataset carries no (or only one) "
                      "split tag — packed shards need a tags.json sidecar "
                      "(write_shard(tags=...)); nothing to report")
            for tag, m in splits.items():
                print(f"validation[{tag}]:",
                      {k: round(v, 4) for k, v in m.items()})
            trainer.write_split_csvs(splits)
        return 0
    trainer.fit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
