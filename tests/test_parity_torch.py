"""Forward-pass parity: torch oracle vs flax model with converted weights
(SURVEY.md §4 item 3; BASELINE.json "reproduces predicted depth maps within
float tolerance")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from radar_depth_tpu.models import create_model
from radar_depth_tpu.oracle.torch_model import (
    TorchDepthNet,
    TorchLateFusionNet,
    TorchMultiStageNet,
)
from radar_depth_tpu.utils.torch_convert import (
    torch_state_dict_to_variables,
    variables_to_torch_state_dict,
)

pytestmark = pytest.mark.slow

OUT = (64, 96)
RNG = np.random.default_rng(3)


def _warm_bn(tmodel, args):
    """Run a few train-mode passes so BN running stats are non-trivial — makes
    the conversion test actually exercise batch_stats mapping."""
    tmodel.train()
    with torch.no_grad():
        for _ in range(3):
            tmodel(*args)
    tmodel.eval()


def _inputs(batch=2):
    rgb = RNG.uniform(size=(batch, *OUT, 3)).astype(np.float32)
    radar = (RNG.uniform(size=(batch, *OUT, 1)) > 0.985).astype(np.float32)
    radar *= RNG.uniform(3, 70, size=radar.shape).astype(np.float32)
    to_t = lambda x: torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    return (rgb, radar), (to_t(rgb), to_t(radar))


@pytest.mark.parametrize("decoder", ["upproj", "upconv", "deconv2", "deconv3"])
def test_depthnet_parity(decoder):
    torch.manual_seed(0)
    (rgb, radar), (trgb, tradar) = _inputs()
    rgbd = np.concatenate([rgb, radar], axis=-1)
    trgbd = torch.cat([trgb, tradar], dim=1)

    tmodel = TorchDepthNet(18, 4, decoder, OUT)
    _warm_bn(tmodel, (trgbd,))
    with torch.no_grad():
        want = tmodel(trgbd).numpy().transpose(0, 2, 3, 1)

    model, _ = create_model("resnet18", modality="rgbd", decoder=decoder,
                            output_size=OUT)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(rgbd), train=False)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), template)
    got = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(rgbd), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_latefusion_parity():
    torch.manual_seed(1)
    (rgb, radar), (trgb, tradar) = _inputs()
    tmodel = TorchLateFusionNet(18, "upproj", OUT)
    _warm_bn(tmodel, (trgb, tradar))
    with torch.no_grad():
        want = tmodel(trgb, tradar).numpy().transpose(0, 2, 3, 1)
    model, _ = create_model("resnet18_latefusion", decoder="upproj", output_size=OUT)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(rgb),
                          jnp.asarray(radar), train=False)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), template)
    got = np.asarray(model.apply(variables, jnp.asarray(rgb), jnp.asarray(radar),
                                 train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_resnet50_parity():
    """ResNet-50 Bottleneck parity (single-branch rgbd AND latefusion):
    converted torch-oracle weights must reproduce the flax forward. Covers
    the 1×1→3×3(s)→1×1(×4) block, its downsample path, and the 2048-ch
    fusion bottleneck (sparse-to-dense.pytorch models.py ships resnet50)."""
    torch.manual_seed(5)
    (rgb, radar), (trgb, tradar) = _inputs()
    rgbd = np.concatenate([rgb, radar], axis=-1)
    trgbd = torch.cat([trgb, tradar], dim=1)

    tmodel = TorchDepthNet(50, 4, "upproj", OUT)
    _warm_bn(tmodel, (trgbd,))
    with torch.no_grad():
        want = tmodel(trgbd).numpy().transpose(0, 2, 3, 1)
    model, _ = create_model("resnet50", modality="rgbd", decoder="upproj",
                            output_size=OUT)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(rgbd), train=False)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), template)
    got = np.asarray(model.apply(variables, jnp.asarray(rgbd), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    tmodel = TorchLateFusionNet(50, "upproj", OUT)
    _warm_bn(tmodel, (trgb, tradar))
    with torch.no_grad():
        want = tmodel(trgb, tradar).numpy().transpose(0, 2, 3, 1)
    model, _ = create_model("resnet50_latefusion", decoder="upproj",
                            output_size=OUT)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(rgb),
                          jnp.asarray(radar), train=False)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), template)
    got = np.asarray(model.apply(variables, jnp.asarray(rgb),
                                 jnp.asarray(radar), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_multistage_parity():
    torch.manual_seed(2)
    (rgb, radar), (trgb, tradar) = _inputs()
    tmodel = TorchMultiStageNet(18, "deconv3", OUT, abs_threshold=2.0)
    _warm_bn(tmodel, (trgb, tradar))
    with torch.no_grad():
        want_c, want_r = tmodel(trgb, tradar)
    model, _ = create_model("resnet18_multistage", decoder="deconv3",
                            output_size=OUT)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(rgb),
                          jnp.asarray(radar), train=False)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), template)
    got_c, got_r = model.apply(variables, jnp.asarray(rgb), jnp.asarray(radar),
                               train=False)
    np.testing.assert_allclose(np.asarray(got_c),
                               want_c.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_r),
                               want_r.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


def test_multistage_stage2_coarse_parity():
    """Forward parity of the --stage2-coarse variant: D1 rides as stage-2's
    second radar-branch channel in both frameworks, so converted weights
    must reproduce both heads (channel ORDER [filtered, coarse] included)."""
    torch.manual_seed(3)
    (rgb, radar), (trgb, tradar) = _inputs()
    tmodel = TorchMultiStageNet(18, "deconv2", OUT, abs_threshold=2.0,
                                stage2_coarse=True)
    _warm_bn(tmodel, (trgb, tradar))
    with torch.no_grad():
        want_c, want_r = tmodel(trgb, tradar)
    model, _ = create_model("resnet18_multistage", decoder="deconv2",
                            output_size=OUT, stage2_coarse=True)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(rgb),
                          jnp.asarray(radar), train=False)
    assert (template["params"]["stage2"]["radar_encoder"]["conv1"]["kernel"]
            .shape[2] == 2)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), template)
    got_c, got_r = model.apply(variables, jnp.asarray(rgb), jnp.asarray(radar),
                               train=False)
    np.testing.assert_allclose(np.asarray(got_c),
                               want_c.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_r),
                               want_r.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("depth", [18, 50])
def test_gradient_parity(depth):
    """Backward parity: d(masked L1 loss)/d(params) through the full
    encoder-decoder must match torch autograd with converted weights
    (eval-mode BN so running stats — not batch stats — feed both backward
    passes). Forward parity alone would not catch transposed-conv/unpool
    gradient mismatches (SURVEY.md §7 hard part #4). depth=50 pins the
    Bottleneck backward (1x1 convs + expansion downsample)."""
    from radar_depth_tpu.objectives import masked_l1_loss
    from radar_depth_tpu.utils.torch_convert import variables_to_torch_state_dict

    torch.manual_seed(4)
    (rgb, radar), (trgb, tradar) = _inputs()
    rgbd = np.concatenate([rgb, radar], axis=-1)
    trgbd = torch.cat([trgb, tradar], dim=1)
    target = RNG.uniform(1, 70, size=(2, *OUT, 1)).astype(np.float32)
    target[RNG.uniform(size=target.shape) < 0.7] = 0.0
    ttarget = torch.from_numpy(target.transpose(0, 3, 1, 2))

    tmodel = TorchDepthNet(depth, 4, "upproj", OUT)
    _warm_bn(tmodel, (trgbd,))
    tmodel.eval()
    pred_t = tmodel(trgbd)
    mask = ttarget > 0
    loss_t = (pred_t - ttarget)[mask].abs().mean()
    loss_t.backward()
    tgrads = {k: p.grad.detach().numpy() for k, p in tmodel.named_parameters()
              if p.grad is not None}

    model, _ = create_model(f"resnet{depth}", modality="rgbd",
                            decoder="upproj", output_size=OUT)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(rgbd), train=False)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), template)

    def loss_fn(params):
        pred = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(rgbd), train=False)
        return masked_l1_loss(pred, jnp.asarray(target))

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5)
    # convert the grad pytree to torch naming and compare tensor-for-tensor
    sd = variables_to_torch_state_dict(
        {"params": grads, "batch_stats": variables["batch_stats"]})
    compared = 0
    for k, want in tgrads.items():
        got = sd[k]
        np.testing.assert_allclose(
            got, want, atol=2e-5, rtol=1e-3,
            err_msg=f"grad mismatch for {k}")
        compared += 1
    assert compared == len(tgrads) and compared > 50


def test_gradient_parity_multistage():
    """Backward parity through the FULL two-stage graph: multistage masked-L1
    (sum of stage losses), radar filter with detached/stop-gradient coarse —
    the flagship training path's gradients match torch autograd."""
    from radar_depth_tpu.objectives import multistage_loss
    from radar_depth_tpu.utils.torch_convert import variables_to_torch_state_dict

    torch.manual_seed(5)
    (rgb, radar), (trgb, tradar) = _inputs()
    target = RNG.uniform(1, 70, size=(2, *OUT, 1)).astype(np.float32)
    target[RNG.uniform(size=target.shape) < 0.7] = 0.0
    ttarget = torch.from_numpy(target.transpose(0, 3, 1, 2))

    tmodel = TorchMultiStageNet(18, "upproj", OUT, abs_threshold=2.0)
    _warm_bn(tmodel, (trgb, tradar))
    tmodel.eval()
    coarse_t, refined_t = tmodel(trgb, tradar)
    mask = ttarget > 0
    loss_t = ((coarse_t - ttarget)[mask].abs().mean()
              + (refined_t - ttarget)[mask].abs().mean())
    loss_t.backward()
    tgrads = {k: p.grad.detach().numpy() for k, p in tmodel.named_parameters()
              if p.grad is not None}

    model, _ = create_model("resnet18_multistage", decoder="upproj",
                            output_size=OUT)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(rgb),
                          jnp.asarray(radar), train=False)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), template)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(rgb), jnp.asarray(radar), train=False)
        return multistage_loss(out, jnp.asarray(target), "l1", (1.0, 1.0))

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5)
    sd = variables_to_torch_state_dict(
        {"params": grads, "batch_stats": variables["batch_stats"]})
    for k, want in tgrads.items():
        np.testing.assert_allclose(sd[k], want, atol=3e-5, rtol=1e-3,
                                   err_msg=f"grad mismatch for {k}")


def test_roundtrip_conversion():
    """jax → torch → jax is the identity."""
    model, _ = create_model("resnet18", modality="rgb", decoder="deconv2",
                            output_size=OUT)
    x = jnp.asarray(RNG.uniform(size=(1, *OUT, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(7), x, train=False)
    sd = variables_to_torch_state_dict(variables)
    back = torch_state_dict_to_variables(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        variables)
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
