"""Batched SE(3) + pinhole camera geometry, jittable end-to-end.

TPU-native re-design of the reference's per-sample nuScenes-devkit math
(upstream:scripts/* generation script; devkit ``RadarPointCloud.
from_file_multisweep`` ego-motion chain and ``view_points`` projection — see
SURVEY.md §2 C5 / §3.3). Everything here is pure, shape-static, and batched:
transforms are (..., 4, 4) float32 arrays, point sets are (..., P, 3) padded
buffers that ride along with boolean validity masks. No data-dependent control
flow, so the whole preprocessing stack fuses into one XLA program.

Conventions
-----------
* Quaternions are (w, x, y, z) — matching nuScenes / pyquaternion order.
* An SE(3) transform ``T_a_from_b`` maps homogeneous points expressed in frame
  ``b`` into frame ``a``: ``p_a = T_a_from_b @ p_b``.
* Camera frame: +x right, +y down, +z forward (depth). Pixel coordinates are
  (u, v) = (column, row), u along width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Geometry must be exact float32: the default matmul precision on TPU (and on
# this CPU backend) downcasts to bfloat16-ish passes, which moves projected
# pixels by whole pixel widths at nuScenes scales. All einsums here pin HIGHEST.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Convert unit quaternion(s) (..., 4) in (w, x, y, z) order to rotation
    matrices (..., 3, 3).

    Mirrors pyquaternion's rotation_matrix as used throughout the reference's
    devkit preprocessing (upstream:scripts/*; SURVEY.md §3.3).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def se3_from_rot_trans(rot: jax.Array, trans: jax.Array) -> jax.Array:
    """Build (..., 4, 4) homogeneous transforms from (..., 3, 3) rotations and
    (..., 3) translations."""
    batch = jnp.broadcast_shapes(rot.shape[:-2], trans.shape[:-1])
    rot = jnp.broadcast_to(rot, batch + (3, 3))
    trans = jnp.broadcast_to(trans, batch + (3,))
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=rot.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_quat_trans(quat: jax.Array, trans: jax.Array) -> jax.Array:
    """Build SE(3) from nuScenes-style (quaternion wxyz, translation) records —
    the ego_pose / calibrated_sensor table format (SURVEY.md §3.3)."""
    return se3_from_rot_trans(quat_to_rot(quat), trans)


def se3_inverse(T: jax.Array) -> jax.Array:
    """Invert (..., 4, 4) rigid transforms analytically: inv([R|t]) = [Rᵀ|-Rᵀt]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -_einsum("...ij,...j->...i", Rt, t)
    return se3_from_rot_trans(Rt, t_inv)


def se3_compose(*Ts: jax.Array) -> jax.Array:
    """Compose transforms left-to-right: se3_compose(A, B, C) = A @ B @ C."""
    out = Ts[0]
    for T in Ts[1:]:
        out = _einsum("...ij,...jk->...ik", out, T)
    return out


def se3_apply(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) transforms to (..., P, 3) points → (..., P, 3).

    Batched equivalent of the devkit's per-sweep ``points = T @ points`` inside
    from_file_multisweep (SURVEY.md §3.3 hot loop)."""
    return (
        _einsum("...ij,...pj->...pi", T[..., :3, :3], pts)
        + T[..., None, :3, 3]
    )


def camera_chain(
    T_global_from_ego_ref: jax.Array,
    T_ego_from_cam: jax.Array,
    T_global_from_ego_sweep: jax.Array,
    T_ego_from_sensor: jax.Array,
) -> jax.Array:
    """Ego-motion-compensation chain: sensor frame at sweep time → reference
    camera frame at sample time.

    T_cam_from_sensor = inv(T_ego_from_cam) ∘ inv(T_global_from_ego_ref)
                        ∘ T_global_from_ego_sweep ∘ T_ego_from_sensor

    This is the exact SE(3) chain the devkit builds per sweep in
    ``from_file_multisweep`` (SURVEY.md §3.3), batched over (..., S) sweeps.
    """
    return se3_compose(
        se3_inverse(T_ego_from_cam),
        se3_inverse(T_global_from_ego_ref),
        T_global_from_ego_sweep,
        T_ego_from_sensor,
    )


def project_points(
    pts_cam: jax.Array,
    K: jax.Array,
    eps: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """Pinhole projection of camera-frame points.

    Batched equivalent of nuscenes-devkit ``view_points(pts, K, normalize=True)``
    (SURVEY.md §3.3).

    Args:
      pts_cam: (..., P, 3) points in camera frame (+z forward).
      K: (..., 3, 3) intrinsics.

    Returns:
      uv: (..., P, 2) pixel coordinates (u=column, v=row), floating point.
      z:  (..., P) depth (camera-frame z). Points with z <= eps produce
          garbage uv — callers must mask on z > 0 (rasterize_min_depth does).
    """
    z = pts_cam[..., 2]
    proj = _einsum("...ij,...pj->...pi", K, pts_cam)
    denom = jnp.where(jnp.abs(proj[..., 2:3]) < eps, eps, proj[..., 2:3])
    uv = proj[..., :2] / denom
    return uv, z
