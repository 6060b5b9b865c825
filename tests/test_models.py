"""Model zoo tests: fused-unpool equivalence, torch conv-transpose parity
(SURVEY.md §7 hard part #4), shapes/finiteness for every registered arch, and
the multistage radar filter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radar_depth_tpu.models import create_model, ARCH_REGISTRY, filter_radar_by_prediction
from radar_depth_tpu.models.layers import (
    conv2d,
    fused_unpool_conv_padding,
    unpool_zero_insert,
    TorchConvTranspose,
)

RNG = np.random.default_rng(0)
OUT = (64, 96)  # tiny but /32-able working size for tests


def test_unpool_fusion_exact():
    """conv(lhs_dilation=2) with our padding == conv(pad=k//2)(explicit unpool)."""
    x = jnp.asarray(RNG.normal(size=(2, 5, 7, 3)).astype(np.float32))
    for k in (3, 5):
        w = jnp.asarray(RNG.normal(size=(k, k, 3, 4)).astype(np.float32))
        explicit = conv2d(unpool_zero_insert(x), w, stride=1, padding=k // 2)
        fused = conv2d(x, w, stride=1,
                       padding=fused_unpool_conv_padding(k, 2), lhs_dilation=(2, 2))
        assert explicit.shape == (2, 10, 14, 4)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(explicit), atol=1e-5)


@pytest.mark.parametrize("k,p,op", [(2, 0, 0), (3, 1, 1)])  # deconv2 / deconv3
def test_conv_transpose_matches_torch(k, p, op):
    import torch
    import torch.nn.functional as F

    x = RNG.normal(size=(2, 6, 9, 5)).astype(np.float32)
    w = RNG.normal(size=(k, k, 5, 4)).astype(np.float32)  # HWIO
    mod = TorchConvTranspose(4, k, stride=2, padding=p, output_padding=op)
    params = {"params": {"kernel": jnp.asarray(w)}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    # torch: NCHW input, weight (in, out, kh, kw)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    want = F.conv_transpose2d(xt, wt, stride=2, padding=p, output_padding=op)
    want = want.numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (2, 12, 18, 4)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("arch", ["resnet18", "resnet18_latefusion", "resnet18_multistage"])
@pytest.mark.parametrize("decoder", ["upproj", "deconv3"])
def test_arch_forward_shapes(arch, decoder):
    model, spec = create_model(arch, decoder=decoder, output_size=OUT)
    key = jax.random.PRNGKey(0)
    rgb = jnp.asarray(RNG.uniform(size=(1, *OUT, 3)).astype(np.float32))
    radar = jnp.asarray((RNG.uniform(size=(1, *OUT, 1)) > 0.99).astype(np.float32) * 20)
    if spec.input_kind == "single":
        rgbd = jnp.concatenate([rgb, radar], axis=-1)
        variables = model.init(key, rgbd, train=False)
        out = model.apply(variables, rgbd, train=False)
    else:
        variables = model.init(key, rgb, radar, train=False)
        out = model.apply(variables, rgb, radar, train=False)
    if spec.multistage:
        assert isinstance(out, tuple) and len(out) == 2
        for o in out:
            assert o.shape == (1, *OUT, 1)
            assert np.isfinite(np.asarray(o)).all()
    else:
        assert out.shape == (1, *OUT, 1)
        assert np.isfinite(np.asarray(out)).all()
    # train-mode apply must update batch_stats
    if spec.input_kind == "single":
        rgbd = jnp.concatenate([rgb, radar], axis=-1)
        _, mut = model.apply(variables, rgbd, train=True, mutable=["batch_stats"])
    else:
        _, mut = model.apply(variables, rgb, radar, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_registry_complete():
    assert set(ARCH_REGISTRY) == {
        "resnet18", "resnet34", "resnet50",
        "resnet18_latefusion", "resnet34_latefusion", "resnet50_latefusion",
        "resnet18_multistage", "resnet34_multistage", "resnet50_multistage",
        "resnet18_multistage_uncertainty", "resnet34_multistage_uncertainty",
    }


def test_resnet50_bottleneck_shapes():
    """ResNet-50 (Bottleneck) encoder: 2048-ch bottleneck, decoder chain
    still lands at the output size; latefusion fuses 2048+2048 channels."""
    from radar_depth_tpu.models.resnet import ResNetEncoder

    enc = ResNetEncoder(depth=50)
    assert enc.out_channels == 2048
    x = jnp.asarray(RNG.uniform(size=(1, *OUT, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    y = enc.apply(variables, x, train=False)
    assert y.shape == (1, OUT[0] // 32, OUT[1] // 32, 2048)
    # block param tree matches torchvision Bottleneck naming
    blk = variables["params"]["layer1_0"]
    assert set(blk) == {"conv1", "bn1", "conv2", "bn2", "conv3", "bn3",
                        "downsample_conv", "downsample_bn"}
    model, spec = create_model("resnet50_latefusion", decoder="upproj",
                               output_size=OUT)
    radar = jnp.asarray(
        (RNG.uniform(size=(1, *OUT, 1)) > 0.99).astype(np.float32) * 20)
    variables = model.init(jax.random.PRNGKey(0), x, radar, train=False)
    # fused concat is 2048 (img) + 2048 (radar, width 64 Bottleneck) wide
    assert variables["params"]["conv2"]["kernel"].shape == (1, 1, 4096, 1024)
    out = model.apply(variables, x, radar, train=False)
    assert out.shape == (1, *OUT, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_filter_radar_by_prediction():
    radar = jnp.asarray([[0.0, 10.0, 10.0, 50.0]])
    pred = jnp.asarray([[5.0, 11.0, 30.0, 50.5]])
    out = np.asarray(filter_radar_by_prediction(radar, pred, abs_threshold=2.0, mode="abs"))
    np.testing.assert_array_equal(out, [[0.0, 10.0, 0.0, 50.0]])
    out = np.asarray(filter_radar_by_prediction(radar, pred, rel_threshold=0.15, mode="rel"))
    np.testing.assert_array_equal(out, [[0.0, 10.0, 0.0, 50.0]])
    # zero pixels never resurrected
    assert np.asarray(filter_radar_by_prediction(jnp.zeros((1, 4)), pred))[0].sum() == 0


def test_phase_unpool_conv_matches_dilated():
    """The MXU-friendly phase decomposition (3x3 conv at H,W -> 4K channels ->
    depth_to_space) is numerically identical to the input-dilated formulation."""
    from radar_depth_tpu.models.decoders import _UnpoolConv

    x = jnp.asarray(RNG.normal(size=(2, 6, 9, 8)).astype(np.float32))
    m_phase = _UnpoolConv(4, 5, impl="phase")
    m_dil = _UnpoolConv(4, 5, impl="dilated")
    v = m_phase.init(jax.random.PRNGKey(0), x)
    y1 = np.asarray(m_phase.apply(v, x))
    y2 = np.asarray(m_dil.apply(v, x))
    assert y1.shape == y2.shape == (2, 12, 18, 4)
    np.testing.assert_allclose(y1, y2, atol=2e-5)


def test_resize_matmul_matches_gather():
    from radar_depth_tpu.models.layers import resize_bilinear, resize_bilinear_matmul

    x = jnp.asarray(RNG.normal(size=(2, 24, 40, 3)).astype(np.float32))
    a = np.asarray(resize_bilinear(x, 45, 80))
    b = np.asarray(resize_bilinear_matmul(x, 45, 80))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_multistage_uncertainty_arch_trains():
    """resnet18_multistage_uncertainty: third output is the (2,) learned
    log-variance; one SGD step moves it (gradient flows from the loss)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from radar_depth_tpu.config import DataConfig, ModelConfig, TrainConfig
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.models import create_model
    from radar_depth_tpu.train.state import create_train_state, make_optimizer
    from radar_depth_tpu.train.step import init_model, make_train_step

    cfg = TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_train=4,
                        num_val=4),
        model=ModelConfig(arch="resnet18_multistage_uncertainty",
                          decoder="deconv2"),
        batch_size=4,
    )
    model, spec = create_model(cfg.model.arch, decoder="deconv2",
                               output_size=(64, 96))
    variables = init_model(model, spec, cfg, jax.random.PRNGKey(0))
    assert variables["params"]["stage_log_var"].shape == (2,)
    tx = make_optimizer(cfg.optim, steps_per_epoch=10)
    state = create_train_state(variables, tx)
    ds = SyntheticNuScenes(4, spec=cfg.data.sample_spec(), seed=0)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(range(4)).items()}
    step = jax.jit(make_train_step(model, spec, cfg, tx))
    new_state, sums = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(sums["loss"]))
    moved = np.abs(np.asarray(new_state.params["stage_log_var"])).max()
    assert moved > 0, "log_var did not receive a gradient"


def test_multistage_uncertainty_cli_flag():
    from radar_depth_tpu.config import parse_command

    cfg = parse_command(["--arch", "resnet18_multistage",
                         "--multistage-uncertainty"])
    assert cfg.model.arch == "resnet18_multistage_uncertainty"


def test_stage_weights_cli_flag():
    from radar_depth_tpu.config import parse_command

    cfg = parse_command(["--arch", "resnet18_multistage",
                         "--stage-weights", "0.5", "2.0"])
    assert cfg.optim.stage_weights == (0.5, 2.0)
    assert parse_command([]).optim.stage_weights == (1.0, 1.0)


def test_stage_weights_scale_multistage_loss():
    import jax.numpy as jnp
    import numpy as np

    from radar_depth_tpu.objectives import multistage_loss

    rng = np.random.default_rng(0)
    target = jnp.asarray(np.abs(rng.standard_normal((2, 8, 8, 1))) + 0.1)
    coarse = jnp.asarray(np.abs(rng.standard_normal((2, 8, 8, 1))))
    refined = jnp.asarray(np.abs(rng.standard_normal((2, 8, 8, 1))))
    base = multistage_loss((coarse, refined), target, "l1", (1.0, 1.0))
    only1 = multistage_loss((coarse, refined), target, "l1", (1.0, 0.0))
    only2 = multistage_loss((coarse, refined), target, "l1", (0.0, 1.0))
    np.testing.assert_allclose(float(only1) + float(only2), float(base),
                               rtol=1e-6)
    half = multistage_loss((coarse, refined), target, "l1", (0.5, 0.5))
    np.testing.assert_allclose(float(half), float(base) / 2, rtol=1e-6)
