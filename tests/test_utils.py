"""CSV logging and viz panel utilities (C11 parity surfaces)."""

import os

import numpy as np

from radar_depth_tpu.utils.csvlog import FIELDNAMES, EpochCSVLogger, write_best_txt
from radar_depth_tpu.utils.viz import colormap_depth, merge_into_row, add_row, save_image


def test_csv_schema_and_append(tmp_path):
    path = str(tmp_path / "train.csv")
    log = EpochCSVLogger(path)
    log.append(0, {"rmse": 1.5, "mae": 1.0, "delta1": 0.5, "data_time": 0.01,
                   "gpu_time": 0.2, "mse": 2.25, "absrel": 0.1, "lg10": 0.05,
                   "delta2": 0.7, "delta3": 0.9})
    log.append(1, {"rmse": 1.2})
    with open(path) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == ",".join(FIELDNAMES)
    assert lines[0] == ("epoch,mse,rmse,absrel,lg10,mae,delta1,delta2,delta3,"
                        "data_time,gpu_time")  # reference schema (SURVEY §5)
    assert len(lines) == 3
    # appending to an existing file must not duplicate the header
    log2 = EpochCSVLogger(path)
    log2.append(2, {"rmse": 1.0})
    with open(path) as f:
        assert len(f.read().strip().splitlines()) == 4

    write_best_txt(str(tmp_path / "best.txt"), 1, {"rmse": 1.2, "mae": 0.9,
                   "absrel": 0.1, "lg10": 0.02, "delta1": 0.9, "delta2": 0.95,
                   "delta3": 0.99})
    content = (tmp_path / "best.txt").read_text()
    assert "epoch=1" in content and "rmse=1.2000" in content


def test_viz_panel(tmp_path):
    h, w = 24, 32
    rng = np.random.default_rng(0)
    rgb = rng.uniform(size=(h, w, 3)).astype(np.float32)
    depth = np.zeros((h, w), np.float32)
    depth[5, 5] = 10.0
    cm = colormap_depth(depth, 80.0)
    assert cm.shape == (h, w, 3) and cm.dtype == np.uint8
    assert (cm[0, 0] == 0).all() and cm[5, 5].sum() > 0  # invalid black, valid colored
    row = merge_into_row(rgb, depth, depth, depth + 1.0, 80.0)
    assert row.shape == (h, 4 * w, 3)
    panel = add_row(None, row)
    panel = add_row(panel, row)
    assert panel.shape == (2 * h, 4 * w, 3)
    save_image(panel, str(tmp_path / "p.png"))
    assert os.path.getsize(tmp_path / "p.png") > 0


def test_tensorboard_logger(tmp_path):
    """Optional TB logging writes event files when tensorflow is present and
    degrades to a no-op otherwise (SURVEY.md §5 addition)."""
    from radar_depth_tpu.utils.tboard import TensorBoardLogger

    tb = TensorBoardLogger(str(tmp_path))
    tb.log("train", 0, {"rmse": 1.25, "loss": 0.5, "skipme": "str"})
    tb.log("val", 0, {"rmse": 1.5})
    tb.close()
    try:
        import tensorflow  # noqa: F401
    except Exception:
        return  # no-op path exercised
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert files and files[0].stat().st_size > 0


def test_profiling_helpers(tmp_path):
    """device_trace writes a profiler capture; annotate/StepTimer run inside
    jitted work (SURVEY.md §5 tracing — beyond-reference addition)."""
    import jax
    import jax.numpy as jnp

    from radar_depth_tpu.utils.profiling import StepTimer, annotate, device_trace

    t = StepTimer()
    x = jnp.arange(8.0)
    t.data_done()
    with device_trace(str(tmp_path / "trace")):
        with annotate("square"):
            y = jax.jit(lambda v: v * v)(x)
    t.step_done(y)
    assert t.data_time >= 0 and t.step_time > 0
    # a capture directory with at least one event artifact was produced
    produced = list((tmp_path / "trace").rglob("*"))
    assert produced, "device_trace produced no artifacts"


def test_model_summary_params():
    """scripts/model_summary.py param counting (shape-eval, no compile)."""
    from scripts.model_summary import summarize_params_only

    n1, s1 = summarize_params_only("resnet18", 64, 96, "deconv2")
    n2, s2 = summarize_params_only("resnet18_latefusion", 64, 96, "deconv2")
    nm, sm = summarize_params_only("resnet18_multistage", 64, 96, "deconv2")
    assert 0 < n1 < n2 < nm
    assert nm == 2 * n2 and sm == 2 * s2  # two identical late-fusion stages


def test_persistent_cache_config(tmp_path, monkeypatch):
    """enable_persistent_cache points jax at a durable dir (creating it),
    honors RDTP_XLA_CACHE_DIR, and its off-switch disables caching without
    touching jax config. Restores conftest's isolated cache dir afterwards
    so later compiles in this process stay sandboxed."""
    import jax

    from radar_depth_tpu.utils.compcache import enable_persistent_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        target = tmp_path / "xla_cache"
        assert enable_persistent_cache(str(target)) == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)

        env_dir = tmp_path / "env_cache"
        monkeypatch.setenv("RDTP_XLA_CACHE_DIR", str(env_dir))
        assert enable_persistent_cache() == str(env_dir)
        assert env_dir.is_dir()

        # off-switch: no-op, config untouched
        monkeypatch.setenv("RDTP_XLA_CACHE_DIR", "0")
        before = jax.config.jax_compilation_cache_dir
        assert enable_persistent_cache() is None
        assert jax.config.jax_compilation_cache_dir == before
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
