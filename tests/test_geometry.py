"""Geometry ops vs independent numpy/scipy-free oracles (SURVEY.md §4 item 1)."""

import numpy as np
import jax.numpy as jnp

from radar_depth_tpu.ops import (
    quat_to_rot,
    se3_apply,
    se3_compose,
    se3_from_quat_trans,
    se3_inverse,
    project_points,
    camera_chain,
)

RNG = np.random.default_rng(0)


def random_quat(shape=()):
    q = RNG.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot_np(q):
    """Textbook quaternion→matrix oracle, written independently."""
    w, x, y, z = q
    return np.array(
        [
            [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
        ]
    )


def test_quat_to_rot_matches_oracle_and_is_rotation():
    qs = random_quat((16,))
    R = np.asarray(quat_to_rot(jnp.asarray(qs)))
    for i in range(16):
        np.testing.assert_allclose(R[i], quat_to_rot_np(qs[i]), atol=1e-5)
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R[i]) > 0.99


def test_se3_inverse_and_compose():
    q = random_quat((8,))
    t = RNG.normal(size=(8, 3)).astype(np.float32)
    T = se3_from_quat_trans(jnp.asarray(q, jnp.float32), jnp.asarray(t))
    eye = se3_compose(T, se3_inverse(T))
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5
    )
    # compose matches matmul
    T2 = se3_from_quat_trans(jnp.asarray(random_quat((8,)), jnp.float32),
                             jnp.asarray(RNG.normal(size=(8, 3)), jnp.float32))
    np.testing.assert_allclose(
        np.asarray(se3_compose(T, T2)),
        np.einsum("bij,bjk->bik", np.asarray(T), np.asarray(T2)),
        atol=1e-5,
    )


def test_se3_apply_matches_homogeneous_matmul():
    q = random_quat((4,))
    t = RNG.normal(size=(4, 3)).astype(np.float32)
    pts = RNG.normal(size=(4, 50, 3)).astype(np.float32)
    T = se3_from_quat_trans(jnp.asarray(q, jnp.float32), jnp.asarray(t))
    got = np.asarray(se3_apply(T, jnp.asarray(pts)))
    Tn = np.asarray(T)
    ph = np.concatenate([pts, np.ones((4, 50, 1), np.float32)], axis=-1)
    want = np.einsum("bij,bpj->bpi", Tn, ph)[..., :3]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_project_points_pinhole():
    K = np.array([[100.0, 0, 64], [0, 100.0, 32], [0, 0, 1]], np.float32)
    pts = np.array([[[0, 0, 10.0], [1, -1, 5.0], [2, 2, 0.5]]], np.float32)
    uv, z = project_points(jnp.asarray(pts), jnp.asarray(K))
    uv, z = np.asarray(uv), np.asarray(z)
    np.testing.assert_allclose(uv[0, 0], [64, 32], atol=1e-4)
    np.testing.assert_allclose(uv[0, 1], [64 + 100 / 5, 32 - 100 / 5], atol=1e-4)
    np.testing.assert_allclose(z[0], [10, 5, 0.5], atol=1e-6)


def test_camera_chain_roundtrip():
    """A point on a static object seen from two ego poses must land in the same
    camera-frame location after ego-motion compensation."""
    # Global-frame static point.
    p_global = np.array([[5.0, 2.0, 1.0]], np.float32)
    q_ref, q_sw = random_quat(), random_quat()
    t_ref = np.array([1.0, 0.0, 0.0], np.float32)
    t_sw = np.array([3.0, -1.0, 0.5], np.float32)
    q_cam, t_cam = random_quat(), np.array([0.2, 0.1, 1.5], np.float32)
    q_sen, t_sen = random_quat(), np.array([2.5, 0.0, 0.5], np.float32)

    T_g_ego_ref = se3_from_quat_trans(jnp.asarray(q_ref, jnp.float32), jnp.asarray(t_ref))
    T_g_ego_sw = se3_from_quat_trans(jnp.asarray(q_sw, jnp.float32), jnp.asarray(t_sw))
    T_ego_cam = se3_from_quat_trans(jnp.asarray(q_cam, jnp.float32), jnp.asarray(t_cam))
    T_ego_sen = se3_from_quat_trans(jnp.asarray(q_sen, jnp.float32), jnp.asarray(t_sen))

    # Point expressed in the sweep sensor frame:
    p_sensor = se3_apply(
        se3_inverse(se3_compose(T_g_ego_sw, T_ego_sen)), jnp.asarray(p_global[None])
    )
    T_chain = camera_chain(T_g_ego_ref, T_ego_cam, T_g_ego_sw, T_ego_sen)
    p_cam = se3_apply(T_chain, p_sensor)
    # Direct: global → cam at ref time.
    p_cam_direct = se3_apply(
        se3_inverse(se3_compose(T_g_ego_ref, T_ego_cam)), jnp.asarray(p_global[None])
    )
    np.testing.assert_allclose(np.asarray(p_cam), np.asarray(p_cam_direct), atol=1e-4)
