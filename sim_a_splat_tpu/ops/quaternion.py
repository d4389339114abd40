"""Batched quaternion math (wxyz convention), pure jnp.

Covers the capability of the reference's torch covariance utilities
(sim_a_splat/ellipsoids/covariance_utils.py:3-143), which converts quaternions
to rotation matrices via a ceres-derived angle-axis detour with Taylor
fallbacks.  Here we use the closed-form quaternion→matrix map, which is exact,
branch-free, fully vectorized, and differentiable — the idiomatic form for
XLA (no masking/select chains needed).

All functions accept arbitrary leading batch dimensions and are safe under
``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion(s) to unit norm. Shape (..., 4), wxyz."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz → rotation matrix (..., 3, 3).

    Matches ``quaternion_to_rotation_matrix`` in the reference
    (covariance_utils.py:141-143) which normalizes before converting.
    """
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def from_rotation_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) → unit quaternion (..., 4) wxyz.

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and select the one seeded from the largest diagonal entry
    (numerically stable for every rotation, jit/vmap-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each stable in a different region.
    sw = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 2.0
    qw = jnp.stack([0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1)

    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
    qx = jnp.stack([(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1)

    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 2.0
    qy = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], axis=-1)

    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 2.0
    qz = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], axis=-1)

    # Pick per-element the candidate with the largest seed.
    seeds = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    choice = jnp.argmax(seeds, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, choice[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0.0, -q, q)
    return normalize(q)


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 (both (..., 4), wxyz)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4).

    Uses the 2-cross-product formula (cheaper than building the matrix).
    """
    q = normalize(q)
    w = q[..., :1]
    u = q[..., 1:]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis (..., 3) and angle (...,) → quaternion (..., 4)."""
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def to_angle_axis(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) wxyz → angle-axis vector (..., 3).

    Capability of the reference's ceres-derived ``quaternion_to_angle_axis``
    (covariance_utils.py:3-66).  Branch-free: where sin(θ/2) ≈ 0 the scale
    2·θ/2 / sin(θ/2) is replaced by its Taylor value 2 (the reference uses
    the same k = 2 fallback via eps masking; here a select).
    """
    q = normalize(q)
    w = q[..., 0]
    v = q[..., 1:]
    sin_half = jnp.linalg.norm(v, axis=-1)
    # atan2 handles w<0 (θ in (π, 2π)) exactly like the reference's
    # sign-corrected atan2(-sin, -cos) branch.
    half = jnp.arctan2(jnp.where(w < 0, -sin_half, sin_half),
                       jnp.where(w < 0, -w, w))
    small = sin_half < 1e-6
    k = jnp.where(small, 2.0, 2.0 * half / jnp.maximum(sin_half, _EPS))
    return v * k[..., None]


def from_angle_axis(aa: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis vector (..., 3) → quaternion (..., 4) wxyz, branch-free
    (sinc-style Taylor fallback for θ → 0)."""
    theta = jnp.linalg.norm(aa, axis=-1)
    half = 0.5 * theta
    small = theta < 1e-6
    # sin(θ/2)/θ → 1/2 − θ²/48 as θ → 0
    s = jnp.where(small, 0.5 - theta * theta / 48.0,
                  jnp.sin(half) / jnp.maximum(theta, _EPS))
    return jnp.concatenate([jnp.cos(half)[..., None], aa * s[..., None]],
                           axis=-1)


def angle_axis_to_rotation_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (..., 3) → rotation matrix (..., 3, 3) via Rodrigues.

    Capability of the reference's ``angle_axis_to_rotation_matrix``
    (covariance_utils.py:68-139), including its small-angle fallback
    R ≈ I + [aa]× — here as a branch-free select on θ < 1e-6.
    """
    theta = jnp.linalg.norm(aa, axis=-1)
    small = theta < 1e-6
    safe = jnp.maximum(theta, _EPS)
    k = aa / safe[..., None]
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack([zeros, -kz, ky, kz, zeros, -kx, -ky, kx, zeros],
                  axis=-1).reshape(aa.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R_full = eye + s[..., None, None] * K + (1.0 - c)[..., None, None] * (K @ K)
    # Taylor: R ≈ I + [aa]× (reference covariance_utils.py:124-135)
    ax, ay, az = aa[..., 0], aa[..., 1], aa[..., 2]
    A = jnp.stack([zeros, -az, ay, az, zeros, -ax, -ay, ax, zeros],
                  axis=-1).reshape(aa.shape[:-1] + (3, 3))
    return jnp.where(small[..., None, None], eye + A, R_full)


def from_rpy(rpy: jnp.ndarray) -> jnp.ndarray:
    """Roll-pitch-yaw (..., 3) extrinsic XYZ → quaternion, matching
    Drake's ``RollPitchYaw`` convention used by the reference
    (manipulator_eef_wrapper.py:57-59): R = Rz(y) @ Ry(p) @ Rx(r)."""
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def to_rpy(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) → roll-pitch-yaw (..., 3), inverse of from_rpy."""
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)
