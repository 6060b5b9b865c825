"""Rasterization vs a sequential numpy z-buffer oracle (SURVEY.md §4 item 1,
hard part #1: exact parity incl. tie handling)."""

import numpy as np
import jax.numpy as jnp

from radar_depth_tpu.ops import (
    rasterize_min_depth,
    accumulate_sweeps,
    radar_to_depth_map,
    extend_height,
    se3_from_quat_trans,
)
from radar_depth_tpu.ops.raster import depth_map_to_points

RNG = np.random.default_rng(1)


def raster_oracle(uv, z, valid, h, w, min_depth=0.0, max_depth=np.inf):
    """Sequential per-point z-buffer, the way the reference's numpy loop works
    (SURVEY.md §3.3)."""
    out = np.zeros((h, w), np.float32)
    best = np.full((h, w), np.inf, np.float32)
    for (u, v), d, ok in zip(uv, z, valid):
        if not ok or not (min_depth < d < max_depth):
            continue
        ui, vi = int(np.floor(u)), int(np.floor(v))
        if 0 <= ui < w and 0 <= vi < h and d < best[vi, ui]:
            best[vi, ui] = d
            out[vi, ui] = d
    return out


def test_rasterize_matches_sequential_oracle():
    h, w, p = 24, 32, 500
    uv = RNG.uniform(-4, 36, size=(p, 2)).astype(np.float32)
    z = RNG.uniform(-1, 90, size=(p,)).astype(np.float32)
    valid = RNG.uniform(size=(p,)) > 0.1
    got = np.asarray(
        rasterize_min_depth(jnp.asarray(uv), jnp.asarray(z), jnp.asarray(valid),
                            h, w, min_depth=0.0, max_depth=80.0)
    )
    want = raster_oracle(uv, z, valid, h, w, max_depth=80.0)
    np.testing.assert_array_equal(got, want)


def test_rasterize_ties_and_duplicates():
    # Same pixel hit many times incl. exact duplicates — min must win.
    uv = np.array([[3.2, 5.9], [3.8, 5.1], [3.5, 5.5], [10.0, 2.0]], np.float32)
    z = np.array([7.0, 4.0, 4.0, 1.0], np.float32)
    valid = np.ones(4, bool)
    got = np.asarray(rasterize_min_depth(jnp.asarray(uv), jnp.asarray(z),
                                         jnp.asarray(valid), 8, 16))
    assert got[5, 3] == 4.0
    assert got[2, 10] == 1.0
    assert got.sum() == 5.0


def test_rasterize_batched():
    h, w, p, b = 12, 16, 64, 5
    uv = RNG.uniform(-2, 18, size=(b, p, 2)).astype(np.float32)
    z = RNG.uniform(0.1, 50, size=(b, p)).astype(np.float32)
    valid = RNG.uniform(size=(b, p)) > 0.3
    got = np.asarray(rasterize_min_depth(jnp.asarray(uv), jnp.asarray(z),
                                         jnp.asarray(valid), h, w))
    for i in range(b):
        np.testing.assert_array_equal(got[i], raster_oracle(uv[i], z[i], valid[i], h, w))


def test_accumulate_sweeps_identity_and_motion():
    s, p = 3, 10
    pts = RNG.normal(size=(s, p, 3)).astype(np.float32)
    valid = np.ones((s, p), bool)
    q = np.array([1.0, 0, 0, 0], np.float32)
    # Pure translation per sweep.
    trans = np.stack([np.array([i * 1.0, 0, 0], np.float32) for i in range(s)])
    T = se3_from_quat_trans(jnp.broadcast_to(jnp.asarray(q), (s, 4)), jnp.asarray(trans))
    merged, mask = accumulate_sweeps(jnp.asarray(pts), jnp.asarray(valid), T)
    merged = np.asarray(merged).reshape(s, p, 3)
    for i in range(s):
        np.testing.assert_allclose(merged[i], pts[i] + trans[i][None], atol=1e-5)
    assert np.asarray(mask).all()


def test_extend_height():
    uv = np.array([[[4.0, 7.0]]], np.float32)
    z = np.array([[3.0]], np.float32)
    valid = np.array([[True]])
    offs = jnp.asarray([-1, 0, 1])
    uv2, z2, v2 = extend_height(jnp.asarray(uv), jnp.asarray(z), jnp.asarray(valid), offs)
    np.testing.assert_allclose(np.asarray(uv2)[0, :, 1], [6.0, 7.0, 8.0])
    np.testing.assert_allclose(np.asarray(uv2)[0, :, 0], [4.0, 4.0, 4.0])
    assert np.asarray(z2).shape == (1, 3) and np.asarray(v2).all()


def test_radar_to_depth_map_end_to_end():
    """Fused kernel == (accumulate ∘ project ∘ rasterize) oracle chain."""
    h, w, s, p = 20, 40, 2, 30
    K = np.array([[30.0, 0, 20], [0, 30.0, 10], [0, 0, 1]], np.float32)
    # Sensor-frame points: in front of a camera looking down +z.
    pts = np.stack([
        RNG.uniform([-3, -1, 2], [3, 1, 40], size=(p, 3)).astype(np.float32)
        for _ in range(s)
    ])
    valid = RNG.uniform(size=(s, p)) > 0.2
    q = np.stack([np.array([1.0, 0, 0, 0]), np.array([0.999, 0.02, 0.02, 0.0])])
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    t = np.stack([np.zeros(3), np.array([0.3, 0.1, -0.2])]).astype(np.float32)
    T = se3_from_quat_trans(jnp.asarray(q, jnp.float32), jnp.asarray(t))

    got = np.asarray(radar_to_depth_map(
        jnp.asarray(pts), jnp.asarray(valid), T, jnp.asarray(K), h, w, max_depth=80.0
    ))

    # Oracle chain in numpy.
    Tn = np.asarray(T)
    all_uv, all_z, all_ok = [], [], []
    for i in range(s):
        pc = (Tn[i, :3, :3] @ pts[i].T).T + Tn[i, :3, 3]
        proj = (K @ pc.T).T
        uv = proj[:, :2] / proj[:, 2:3]
        all_uv.append(uv); all_z.append(pc[:, 2]); all_ok.append(valid[i])
    want = raster_oracle(np.concatenate(all_uv), np.concatenate(all_z),
                         np.concatenate(all_ok), h, w, max_depth=80.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_depth_map_to_points_roundtrip():
    h, w = 16, 16
    depth = np.zeros((h, w), np.float32)
    depth[3, 4] = 7.5
    depth[10, 2] = 2.0
    uv, z, valid = depth_map_to_points(jnp.asarray(depth), max_points=8)
    uv, z, valid = np.asarray(uv), np.asarray(z), np.asarray(valid)
    assert valid.sum() == 2
    recon = np.asarray(rasterize_min_depth(jnp.asarray(uv), jnp.asarray(z),
                                           jnp.asarray(valid), h, w))
    np.testing.assert_array_equal(recon, depth)
