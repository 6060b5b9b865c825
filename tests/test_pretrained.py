"""ImageNet-pretrained grafting (--pretrained) and sparsifier CLI paths."""

import numpy as np
import torch

from radar_depth_tpu.config import parse_command
from radar_depth_tpu.oracle.torch_model import Encoder
from radar_depth_tpu.train.loop import Trainer


def _fake_torchvision_sd(depth=18):
    """Oracle Encoder (layer1_0 naming) → torchvision naming (layer1.0)."""
    enc = Encoder(depth, 3)
    sd = {}
    for k, v in enc.state_dict().items():
        k2 = k
        for s in range(1, 5):
            for b in range(0, 6):
                k2 = k2.replace(f"layer{s}_{b}.", f"layer{s}.{b}.")
        k2 = k2.replace(".downsample_conv.", ".downsample.0.").replace(
            ".downsample_bn.", ".downsample.1.")
        sd[k2] = v
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    return enc, sd


def test_graft_pretrained_into_latefusion(tmp_path):
    from tests.test_train import tiny_config

    torch.manual_seed(0)
    enc, sd = _fake_torchvision_sd()
    ckpt = tmp_path / "imagenet_resnet18.pth"
    torch.save(sd, ckpt)

    cfg = tiny_config(tmp_path / "run", arch="resnet18_latefusion",
                      pretrained=str(ckpt))
    tr = Trainer(cfg)
    # img_encoder conv1 must equal the torch weights (O,I,kh,kw → HWIO)
    want = enc.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    got = np.asarray(tr.state.params["img_encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, want, atol=1e-6)
    # bn running stats grafted too
    np.testing.assert_allclose(
        np.asarray(tr.state.batch_stats["img_encoder"]["bn1"]["mean"]),
        enc.bn1.running_mean.numpy(), atol=1e-6)
    # radar branch conv1 (1-ch) must have been skipped (shape mismatch) but
    # deeper layers grafted
    radar_conv1 = np.asarray(tr.state.params["radar_encoder"]["conv1"]["kernel"])
    assert radar_conv1.shape[2] == 1
    np.testing.assert_allclose(
        np.asarray(tr.state.params["radar_encoder"]["layer1_0"]["conv1"]["kernel"]),
        enc.layer1_0.conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
        atol=1e-6)


def test_cli_flags_roundtrip():
    cfg = parse_command([
        "--arch", "resnet18", "--modality", "d", "--sparsifier", "uar",
        "--num-samples", "321", "--no-augment", "-c", "l2", "-b", "4",
        "--height-extension", "2", "--workers", "6",
        "--eval-batch-size", "16", "--metric-avg", "batch", "--eval-splits",
        "--raster-backend", "scatter", "--gt-augment", "rerasterize",
    ])
    assert cfg.data.sparsifier == "uar"
    assert cfg.data.num_samples == 321
    assert not cfg.augment.enabled
    assert cfg.optim.criterion == "l2"
    assert cfg.batch_size == 4
    assert cfg.data.height_extension == 2
    assert cfg.workers == 6
    assert cfg.eval_batch_size == 16
    assert cfg.metric_avg == "batch"
    assert cfg.eval_splits
    assert cfg.data.raster_backend == "scatter"
    assert cfg.data.gt_augment == "rerasterize"


def test_sparsifier_path_feeds_model(tmp_path):
    """--sparsifier uar: the sparse channel comes from GT, trains one step."""
    import jax
    from tests.test_train import tiny_config
    from radar_depth_tpu.parallel import shard_batch
    from radar_depth_tpu.train.loop import iterate_batches
    from radar_depth_tpu.config import TrainConfig, DataConfig

    base = tiny_config(tmp_path, arch="resnet18")
    data = DataConfig(**{**base.data.__dict__, "sparsifier": "uar",
                         "num_samples": 64})
    cfg = TrainConfig(**{**base.__dict__, "data": data})
    tr = Trainer(cfg)
    batch = next(iterate_batches(tr.train_ds, cfg.batch_size, True, 0, True))
    batch = shard_batch(batch, tr.mesh)
    _, sums = tr._train_step(tr.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(sums["loss"]))
