"""Phase-domain UpProj block == direct UpProj block, bit-for-bit semantics
(same params, same outputs, same batch_stats updates)."""

import numpy as np
import jax
import jax.numpy as jnp

from radar_depth_tpu.models.decoders import UpProjBlock
from radar_depth_tpu.models.packed import PackedUpProjBlock, packed_conv3_kernels
from radar_depth_tpu.models.layers import conv2d, depth_to_space2

RNG = np.random.default_rng(11)


def test_packed_conv3_equivalence():
    """packed conv3 on phase-packed input == logical conv3 after d2s."""
    k = 8
    x_packed = jnp.asarray(RNG.normal(size=(2, 5, 7, 4 * k)).astype(np.float32))
    w3 = jnp.asarray(RNG.normal(size=(3, 3, k, k)).astype(np.float32))
    logical = depth_to_space2(x_packed)  # (2, 10, 14, k)
    want = conv2d(logical, w3, stride=1, padding=1)
    got_packed = conv2d(x_packed, packed_conv3_kernels(w3), stride=1, padding=1)
    got = depth_to_space2(got_packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_upproj_block_matches_direct():
    x = jnp.asarray(RNG.normal(size=(2, 6, 9, 16)).astype(np.float32))
    direct = UpProjBlock(8)
    packed = PackedUpProjBlock(8)
    v = direct.init(jax.random.PRNGKey(0), x, False)
    # identical param trees
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        packed.init(jax.random.PRNGKey(0), x, False))

    # eval mode
    y1 = np.asarray(direct.apply(v, x, False))
    y2 = np.asarray(packed.apply(v, x, False))
    assert y1.shape == y2.shape == (2, 12, 18, 8)
    np.testing.assert_allclose(y2, y1, atol=3e-5)

    # train mode: outputs AND updated batch stats must match
    o1, m1 = direct.apply(v, x, True, mutable=["batch_stats"])
    o2, m2 = packed.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=3e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                                atol=3e-5),
        m1, m2,
    )

    # gradients flow and match
    def loss(fn, v):
        return jnp.sum(fn.apply(v, x, False) ** 2)

    g1 = jax.grad(lambda v: loss(direct, v))(v)["params"]
    g2 = jax.grad(lambda v: loss(packed, v))(v)["params"]
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3,
                                   rtol=1e-4)
