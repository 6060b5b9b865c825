"""Single config tree + CLI mirroring the reference's argparse knobs
(upstream:utils.py::parse_command; SURVEY.md §5 "Config / flag system").

Every semantic knob of the reference exists here under the same name/values so
reference run recipes translate mechanically:
  --arch --modality --decoder --criterion/-c -b/--batch-size --epochs --lr
  --momentum --weight-decay --workers --resume --evaluate
plus TPU-native additions (dtype, mesh size, height-extension, synthetic-data
sizes) that have no reference counterpart.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Tuple

from radar_depth_tpu.data.schema import SampleSpec
from radar_depth_tpu.models import ARCH_REGISTRY, MODALITY_CHANNELS
from radar_depth_tpu.models.decoders import DECODER_KINDS
from radar_depth_tpu.ops.augment import AugmentConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"  # synthetic | packed (binary shards on disk)
    data_root: str = ""  # for packed datasets
    height: int = 450
    width: int = 800
    num_sweeps: int = 5
    max_depth: float = 80.0
    height_extension: int = 0
    num_train: int = 256  # synthetic split sizes
    num_val: int = 64
    seed: int = 0
    # Inherited sparsifier knobs (upstream --sparsifier/--num-samples; C6):
    sparsifier: str = "none"  # none | uar | sim_stereo
    num_samples: int = 200
    # z-buffer backend: sorted (default, 1.4-1.7x faster) | scatter (NOTES.md)
    raster_backend: str = "sorted"
    # GT handling under in-graph train augmentation: warp (reference
    # transform semantics, default) | rerasterize (geometrically exact
    # re-projection of the LiDAR points; see ops/preprocess.py)
    gt_augment: str = "warp"

    def sample_spec(self) -> SampleSpec:
        return SampleSpec(
            height=self.height, width=self.width, num_sweeps=self.num_sweeps,
            max_depth=self.max_depth,
        )


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    arch: str = "resnet18_latefusion"
    modality: str = "rgbd"  # for single-branch archs: rgb | rgbd | d
    decoder: str = "upproj"
    dtype: str = "float32"  # compute dtype: float32 | bfloat16
    # two-stage filter (SURVEY.md §3.4 [M] rule). Defaults mirror the
    # reference's assumed operating point so its recipes reproduce
    # unchanged; the r5 threshold sweep measured abs=4 as the better
    # operating point (NOTES.md "Filter-threshold sweep"), applicable to
    # existing checkpoints at eval time since thresholds are runtime config.
    filter_mode: str = "abs"
    abs_threshold: float = 2.0
    rel_threshold: float = 0.15
    pretrained: str = ""  # path to converted torchvision weights (no network)
    stage1_path: str = ""  # init multistage stage1/stage2 from a checkpoint
    remat: bool = False  # rematerialize multistage stages in backward
    # SURVEY.md §3.4 "(+D₁?)" [M]: feed the coarse prediction to stage-2 as a
    # second radar-branch channel (stop_gradient'ed; see models/fusion.py)
    stage2_coarse: bool = False
    # brightness-conditional output policy (models/fusion.py::
    # blend_by_brightness): >0 ⇒ eval/serving emit refined where mean RGB
    # < tau, coarse where brighter. 0 disables (pure refined output).
    blend_tau: float = 0.0


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-4
    lr_decay_epochs: int = 5  # step decay ×factor every N epochs (C12)
    lr_decay_factor: float = 0.1
    criterion: str = "l1"  # l1 | l2
    stage_weights: Tuple[float, float] = (1.0, 1.0)
    # Gradient accumulation (SURVEY.md §2 parallelism table: "trivial under
    # jit if needed"): each optimizer step averages gradients over N
    # consecutive micro-batches of --batch-size (effective batch = N × B)
    # inside ONE jitted program (lax.scan), so recipes that need a larger
    # effective batch than HBM allows keep exact SGD semantics. BatchNorm
    # statistics update sequentially per micro-batch, matching N forward
    # passes of the reference's loop.
    grad_accum: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    data: DataConfig = DataConfig()
    model: ModelConfig = ModelConfig()
    optim: OptimConfig = OptimConfig()
    augment: AugmentConfig = AugmentConfig()
    batch_size: int = 8
    # Val-pass batch size (0 = same as batch_size). Eval has no optimizer
    # memory, so larger batches amortize dispatch overhead (NOTES.md).
    # CAVEAT: with --metric-avg batch (the default) the pooling granularity
    # IS the loop batch (reference Result.evaluate semantics), so changing
    # this changes the reported rmse/irmse slightly; keep it at the
    # reference batch size when comparing AverageMeter numbers.
    # --metric-avg sample is batch-size invariant.
    eval_batch_size: int = 0
    # Native-loader prefetch threads (reference DataLoader num_workers;
    # 0 = default 4). Augmentation runs in these threads (SURVEY.md §3.1).
    workers: int = 0
    epochs: int = 15
    seed: int = 42
    output_dir: str = "runs/default"
    resume: str = ""
    # Warm start: graft params/batch_stats from a same-arch run's best
    # checkpoint, fresh optimizer/epoch (vs --resume which restores both).
    init_from: str = ""
    evaluate: str = ""
    print_freq: int = 10
    val_viz_every: int = 50  # comparison PNG every N val batches (C11)
    # Metric averaging convention (SURVEY.md §2 C9 / VERDICT r1 weak #7):
    # "batch" (default) = the reference's AverageMeter weighting (pixel-pooled
    # per batch, weighted by batch size) so default CSVs compare 1:1 against
    # reference numbers (VERDICT r2 #7); "sample" = per-sample pixel means
    # averaged over samples — batch-size invariant and exact under padded
    # eval tails, opt in via --metric-avg sample.
    metric_avg: str = "batch"
    # --evaluate also reports per-split (day/night) metrics when the val
    # dataset carries sample tags (paper reports splits separately; §6).
    eval_splits: bool = False
    tensorboard: bool = False
    mesh_axis: str = "data"
    # Stall watchdog: hard-exit (code 86) if no train/val batch completes
    # for this many seconds — the device backend can wedge with an in-flight
    # dispatch blocked forever (measured multi-hour relay outage, NOTES.md);
    # saves are atomic and --resume is exact, so a loud resumable crash
    # beats a silent hang. Must exceed the longest single blocking call
    # (full-res remote compiles: 5-10 min). 0 disables.
    stall_timeout: float = 3600.0
    # Checkpoint cadence: save every k-th epoch (plus every best-RMSE
    # improvement and always the final epoch). The per-epoch device→host
    # state fetch dominates epoch wall time on the bench relay (measured
    # 23-28s vs 9s train at 96×160 — NOTES.md r4), so k>1 trades restart
    # granularity for throughput. k=1 (default) is the reference's
    # save-every-epoch behavior (upstream:utils.py::save_checkpoint).
    ckpt_every: int = 1
    # Spatial partitioning (SURVEY.md §5 "spatial partitioning of convs would
    # be the analogue" — built, not just documented): shard image HEIGHT over
    # a 'space' mesh axis of this size; batch shards over the remaining
    # devices. GSPMD inserts the conv halo exchanges. Use when one sample's
    # activations exceed a chip (ultra-high-res); topology knob, NOT adopted
    # from run config.json.
    spatial: int = 1
    # Backend selection: "default" keeps whatever backend the interpreter
    # booted with (the axon TPU plugin registers itself via sitecustomize
    # and the JAX_PLATFORMS env var is ignored — measured); "cpu" forces the
    # CPU backend via jax.config before first device use, so eval/ablation
    # runs can execute off-TPU without hand-rolled wrappers. Host knob —
    # NOT adopted from run config.json.
    platform: str = "default"


def save_config(cfg: TrainConfig, path: str) -> None:
    """Persist the full config tree as JSON (the self-describing-run half of
    upstream's habit of pickling args/model into the checkpoint; C10)."""
    import json

    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1, sort_keys=True)


def _known_fields(cls, d: dict) -> dict:
    """Keep only keys cls defines — a config.json written by a newer (or
    older) version of this code must still load; unknown keys are dropped,
    missing ones take the dataclass defaults."""
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def load_config(path: str) -> TrainConfig:
    """Inverse of save_config (version-tolerant, see _known_fields)."""
    import json

    with open(path) as f:
        d = json.load(f)
    optim = _known_fields(OptimConfig, d.get("optim", {}))
    if "stage_weights" in optim:
        optim["stage_weights"] = tuple(optim["stage_weights"])
    aug = _known_fields(AugmentConfig, d.get("augment", {}))
    if "scale_range" in aug:
        aug["scale_range"] = tuple(aug["scale_range"])
    top = _known_fields(TrainConfig, {
        k: v for k, v in d.items()
        if k not in ("data", "model", "optim", "augment")})
    return TrainConfig(
        data=DataConfig(**_known_fields(DataConfig, d.get("data", {}))),
        model=ModelConfig(**_known_fields(ModelConfig, d.get("model", {}))),
        optim=OptimConfig(**optim), augment=AugmentConfig(**aug), **top)


# argparse dest → path into the saved config tree, for the flags a run's
# config.json supplies when the CLI leaves them at their default
# (--evaluate/--resume convenience: the reference pickles args+model into its
# checkpoints, so `--evaluate CKPT` there needs no arch flags — SURVEY.md §2
# C10. An explicitly passed non-default flag always wins).
_RUN_CONFIG_FLAGS = {
    "arch": ("model", "arch"), "modality": ("model", "modality"),
    "decoder": ("model", "decoder"), "dtype": ("model", "dtype"),
    "filter_mode": ("model", "filter_mode"),
    "abs_threshold": ("model", "abs_threshold"),
    "rel_threshold": ("model", "rel_threshold"),
    "stage2_coarse": ("model", "stage2_coarse"),
    "blend_tau": ("model", "blend_tau"),
    "height": ("data", "height"), "width": ("data", "width"),
    "num_sweeps": ("data", "num_sweeps"), "max_depth": ("data", "max_depth"),
    "height_extension": ("data", "height_extension"),
    "sparsifier": ("data", "sparsifier"),
    "num_samples": ("data", "num_samples"),
    "raster_backend": ("data", "raster_backend"),
    "gt_augment": ("data", "gt_augment"),
    "dataset": ("data", "dataset"), "data_root": ("data", "data_root"),
    "num_train": ("data", "num_train"), "num_val": ("data", "num_val"),
    "batch_size": ("batch_size",), "eval_batch_size": ("eval_batch_size",),
    "metric_avg": ("metric_avg",),
}


def _adopt_run_config(a, parser) -> None:
    """For --evaluate/--resume: fill CLI-default model/data flags from the
    run's config.json (written by Trainer), so run dirs are self-describing
    like the reference's args-carrying checkpoints."""
    import json
    import os

    run = a.evaluate or a.resume
    # --evaluate also accepts .../checkpoints or .../checkpoints/<step>
    # (restore_for_evaluate); config.json lives in the run dir above them
    if os.path.basename(run).isdigit():
        run = os.path.dirname(run)
    if os.path.basename(run) == "checkpoints":
        run = os.path.dirname(run)
    path = os.path.join(run, "config.json")
    if not os.path.isfile(path):
        if "multistage" in a.arch:
            # Measured foot-gun (NOTES.md r3): evaluating a rel-filter run
            # with the default abs filter silently rebuilds a different
            # graph (the filter has no params, so restore succeeds) and
            # cost 6.7% RMSE on the r34 best checkpoint.
            print(f"warning: {path} not found — cannot recover the run's "
                  "filter flags; make sure --filter-mode/--*-threshold"
                  "/--stage2-coarse match how it was trained")
        return
    with open(path) as f:
        saved = json.load(f)
    for dest, keys in _RUN_CONFIG_FLAGS.items():
        if getattr(a, dest) != parser.get_default(dest):
            continue  # explicit (non-default) CLI value wins
        node = saved
        try:
            for k in keys:
                node = node[k]
        except KeyError:
            continue  # config.json from a version without this field
        setattr(a, dest, node)
    # --no-augment (store_true) only matters for --resume continuation
    if not a.no_augment and not saved.get("augment", {}).get("enabled", True):
        a.no_augment = True


def parse_command(argv=None) -> TrainConfig:
    """Reference-compatible CLI (upstream:utils.py::parse_command)."""
    p = argparse.ArgumentParser(description="radar_depth_tpu training harness")
    p.add_argument("--arch", default="resnet18_latefusion",
                   choices=sorted(ARCH_REGISTRY))
    p.add_argument("--modality", default="rgbd", choices=sorted(MODALITY_CHANNELS))
    p.add_argument("--decoder", default="upproj", choices=list(DECODER_KINDS))
    p.add_argument("-c", "--criterion", default="l1", choices=["l1", "l2"])
    p.add_argument("-b", "--batch-size", type=int, default=8)
    p.add_argument("--eval-batch-size", type=int, default=0,
                   help="val-pass batch size (0 = same as --batch-size)")
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--workers", type=int, default=0,
                   help="native-loader prefetch threads (the reference's "
                        "DataLoader num_workers; 0 = default 4)")
    p.add_argument("--resume", default="", metavar="CKPT")
    p.add_argument("--init-from", default="", metavar="RUN",
                   help="warm-start params from a same-arch run (fresh "
                        "optimizer/epoch; cf. --resume)")
    p.add_argument("--evaluate", default="", metavar="CKPT")
    p.add_argument("--output-dir", default="runs/default")
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--stall-timeout", type=float, default=3600.0,
                   help="exit 86 (resumable crash) if no batch completes "
                        "for this many seconds — wedged-backend protection; "
                        "0 disables")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="save a checkpoint every k-th epoch (best-RMSE "
                        "improvements and the final epoch always save); "
                        "k>1 skips the per-epoch device→host state fetch "
                        "that dominates epoch wall time on slow links")
    p.add_argument("--spatial", type=int, default=1,
                   help="shard image height over a 'space' mesh axis of this "
                        "size (spatial conv partitioning for ultra-high-res; "
                        "batch shards over the remaining devices)")
    p.add_argument("--seed", type=int, default=42)
    # data
    p.add_argument("--dataset", default="synthetic", choices=["synthetic", "packed"])
    p.add_argument("--data-root", default="")
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--num-sweeps", type=int, default=5)
    p.add_argument("--max-depth", type=float, default=80.0)
    p.add_argument("--height-extension", type=int, default=0)
    p.add_argument("--sparsifier", default="none",
                   choices=["none", "uar", "sim_stereo"])
    p.add_argument("--num-samples", type=int, default=200,
                   help="sparsifier target sample count (upstream flag)")
    p.add_argument("--raster-backend", default="sorted",
                   choices=["sorted", "scatter"],
                   help="z-buffer backend (sorted = parallel sort + unique "
                        "set, 1.4-1.7x faster on TPU; see NOTES.md)")
    p.add_argument("--gt-augment", default="warp",
                   choices=["warp", "rerasterize"],
                   help="GT under in-graph augmentation: warp = reference "
                        "nearest-warp semantics; rerasterize = exact "
                        "re-projection of LiDAR points")
    p.add_argument("--no-augment", action="store_true",
                   help="disable train-time augmentation")
    p.add_argument("--num-train", type=int, default=256)
    p.add_argument("--num-val", type=int, default=64)
    # model extras
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--filter-mode", default="abs", choices=["abs", "rel", "or"])
    p.add_argument("--abs-threshold", type=float, default=2.0)
    p.add_argument("--rel-threshold", type=float, default=0.15)
    p.add_argument("--blend-tau", type=float, default=0.0,
                   help="brightness-conditional output policy: emit refined "
                        "where per-sample mean RGB < tau, coarse where "
                        "brighter (removes the measured day-RMSE refinement "
                        "tax); 0 disables")
    p.add_argument("--pretrained", default="")
    p.add_argument("--stage1-path", default="")
    p.add_argument("--remat", action="store_true",
                   help="recompute multistage stages in backward (bigger batches)")
    p.add_argument("--stage2-coarse", action="store_true",
                   help="feed the coarse prediction to stage-2 as an extra "
                        "radar-branch channel (SURVEY §3.4 '(+D1?)' variant)")
    p.add_argument("--multistage-uncertainty", action="store_true",
                   help="learned per-stage log-variance loss weighting "
                        "(speculative parity surface, SURVEY.md §2 C7 [M])")
    p.add_argument("--stage-weights", type=float, nargs=2, default=[1.0, 1.0],
                   metavar=("W1", "W2"),
                   help="multistage loss weighting: loss = W1*l(coarse) + "
                        "W2*l(refined) (upstream weighting is [M] in "
                        "SURVEY.md §3.4; default equal weights)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batches averaged per optimizer step "
                        "(effective batch = N x batch-size; BN stats update "
                        "per micro-batch)")
    # schedule
    p.add_argument("--lr-decay-epochs", type=int, default=5)
    p.add_argument("--lr-decay-factor", type=float, default=0.1)
    # metrics
    p.add_argument("--metric-avg", default="batch",
                   choices=["sample", "batch"],
                   help="'batch' (default) = reference AverageMeter weighting "
                        "(pixel-pooled per batch × batch size); 'sample' = "
                        "batch-size-invariant per-sample means")
    p.add_argument("--eval-splits", action="store_true",
                   help="report per-split (day/night) metrics at --evaluate")
    p.add_argument("--platform", default="default", choices=["default", "cpu"],
                   help="force the jax backend; 'cpu' runs this process "
                        "off-TPU (the axon plugin ignores JAX_PLATFORMS)")
    a = p.parse_args(argv)
    if a.evaluate or a.resume:
        _adopt_run_config(a, p)
    if a.multistage_uncertainty:
        if not a.arch.endswith("_multistage"):
            p.error("--multistage-uncertainty requires a *_multistage arch")
        a.arch += "_uncertainty"
    return TrainConfig(
        data=DataConfig(
            dataset=a.dataset, data_root=a.data_root, height=a.height,
            width=a.width, num_sweeps=a.num_sweeps, max_depth=a.max_depth,
            height_extension=a.height_extension, num_train=a.num_train,
            num_val=a.num_val, seed=a.seed,
            sparsifier=a.sparsifier, num_samples=a.num_samples,
            raster_backend=a.raster_backend, gt_augment=a.gt_augment,
        ),
        model=ModelConfig(
            arch=a.arch, modality=a.modality, decoder=a.decoder, dtype=a.dtype,
            filter_mode=a.filter_mode, abs_threshold=a.abs_threshold,
            rel_threshold=a.rel_threshold, pretrained=a.pretrained,
            stage1_path=a.stage1_path, remat=a.remat,
            stage2_coarse=a.stage2_coarse, blend_tau=a.blend_tau,
        ),
        optim=OptimConfig(
            lr=a.lr, momentum=a.momentum, weight_decay=a.weight_decay,
            lr_decay_epochs=a.lr_decay_epochs, lr_decay_factor=a.lr_decay_factor,
            criterion=a.criterion, grad_accum=a.grad_accum,
            stage_weights=tuple(a.stage_weights),
        ),
        augment=AugmentConfig(enabled=not a.no_augment),
        batch_size=a.batch_size, eval_batch_size=a.eval_batch_size,
        workers=a.workers, epochs=a.epochs, seed=a.seed,
        output_dir=a.output_dir, resume=a.resume, init_from=a.init_from,
        evaluate=a.evaluate,
        print_freq=a.print_freq, tensorboard=a.tensorboard,
        metric_avg=a.metric_avg, eval_splits=a.eval_splits,
        spatial=a.spatial, stall_timeout=a.stall_timeout,
        ckpt_every=a.ckpt_every,
        platform=a.platform,
    )
