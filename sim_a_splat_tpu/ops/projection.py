"""Perspective camera model and EWA splat projection.

Replaces the projection stage of the gsplat CUDA rasterizer that the
reference invokes through nerfstudio (ns_utils/nerfstudio_utils.py:123-177)
and the browser WebGL renderer behind ``client.get_render``
(splat_env_wrapper.py:148-157).  Conventions follow gsplat "classic" mode:

- camera-to-world pose in OpenCV convention (+x right, +y down, +z forward),
- pinhole intrinsics fx, fy, cx, cy,
- 2D covariance Σ₂ = J W Σ Wᵀ Jᵀ + blur·I with blur = 0.3 px,
- radius = 3·sqrt(max eigenvalue of Σ₂).

Image width/height are static (Python ints) so everything jits to fixed
shapes; all array math is batched over gaussians and differentiable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from sim_a_splat_tpu.ops.transforms import SE3

# gsplat classic-mode screen-space dilation added to the diagonal of the
# projected 2D covariance (anti-aliasing floor of ~0.3px).
BLUR_2D = 0.3


@struct.dataclass
class Camera:
    """Pinhole camera. ``pose`` maps camera coords → world coords (OpenCV)."""

    pose: SE3                        # camera-to-world
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=256)
    height: int = struct.field(pytree_node=False, default=256)

    @staticmethod
    def from_fov(pose: SE3, fov_y: float, width: int, height: int) -> "Camera":
        """Build from a vertical field-of-view (radians), square pixels —
        the parametrization viser's browser camera uses for get_render."""
        fy = 0.5 * height / jnp.tan(0.5 * jnp.asarray(fov_y, jnp.float32))
        fx = fy
        return Camera(
            pose=pose,
            fx=fx,
            fy=fy,
            cx=jnp.asarray(width / 2.0, jnp.float32),
            cy=jnp.asarray(height / 2.0, jnp.float32),
            width=width,
            height=height,
        )


class Projected(NamedTuple):
    """Per-gaussian screen-space quantities produced by :func:`project`."""

    xy: jnp.ndarray       # (N, 2) pixel coords of the projected mean
    depth: jnp.ndarray    # (N,) camera-frame z
    conic: jnp.ndarray    # (N, 3) upper triangle (a, b, c) of Σ₂⁻¹
    radius: jnp.ndarray   # (N,) 3σ screen radius in pixels (0 ⇒ culled)
    valid: jnp.ndarray    # (N,) bool: in front of camera and non-degenerate


def project(
    means: jnp.ndarray,
    covs: jnp.ndarray,
    camera: Camera,
    near: float = 0.01,
    eps2d: float = BLUR_2D,
) -> Projected:
    """Project 3D gaussians to screen space (EWA splatting).

    Args:
      means: (N, 3) world-space centers.
      covs:  (N, 3, 3) world-space covariances.
      camera: target camera.

    Fully differentiable w.r.t. means/covs and camera pose/intrinsics.
    """
    w2c = camera.pose.inverse()
    R = w2c.rotation_matrix()                       # (3, 3)
    p_cam = means @ R.T + w2c.t                     # (N, 3)
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    zc = jnp.maximum(z, near)

    # Pixel coords of the mean.
    u = camera.fx * x / zc + camera.cx
    v = camera.fy * y / zc + camera.cy
    xy = jnp.stack([u, v], axis=-1)

    # Camera-frame covariance: W Σ Wᵀ with W = R (w2c rotation).
    cov_cam = jnp.einsum("ij,njk,lk->nil", R, covs, R)

    # Jacobian of perspective projection at the mean.
    inv_z = 1.0 / zc
    inv_z2 = inv_z * inv_z
    # J = [[fx/z, 0, -fx x/z²], [0, fy/z, -fy y/z²]]
    j00 = camera.fx * inv_z
    j02 = -camera.fx * x * inv_z2
    j11 = camera.fy * inv_z
    j12 = -camera.fy * y * inv_z2

    c00, c01, c02 = cov_cam[..., 0, 0], cov_cam[..., 0, 1], cov_cam[..., 0, 2]
    c11, c12, c22 = cov_cam[..., 1, 1], cov_cam[..., 1, 2], cov_cam[..., 2, 2]

    # Σ₂ = J Σc Jᵀ expanded (J has the sparsity above).
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + eps2d
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + eps2d

    det = a * c - b * b
    det_safe = jnp.maximum(det, 1e-12)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # 3σ radius from the larger eigenvalue of Σ₂.
    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det_safe, 0.01))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    valid = (z > near) & (det > 0.0)
    # Cull gaussians fully outside the image.
    inside = (
        (u + radius > 0.0)
        & (u - radius < camera.width)
        & (v + radius > 0.0)
        & (v - radius < camera.height)
    )
    valid = valid & inside
    radius = jnp.where(valid, radius, 0.0)
    return Projected(xy=xy, depth=z, conic=conic, radius=radius, valid=valid)


def _finish_projection(p_cam, m0, m1, m2, camera, near, eps2d,
                       dilate: float = 0.0) -> Projected:
    """Shared tail of :func:`project` / :func:`project_raw`: perspective
    Jacobian, 2D conic, radius, culling — from camera-frame means ``p_cam``
    and the rows ``m0/m1/m2`` (N, 3) of M = R_cam·S (so Σ_cam = M Mᵀ).

    ``dilate`` (pixels) pads the 3σ radius AND the image-bounds cull — the
    conservative-superset projection behind the moving-camera candidate
    cache (ops/rasterize_moving.py): binning with a dilated footprint keeps
    every gaussian that can touch a tile while the camera moves less than
    ``dilate`` pixels of screen-space shift."""
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    zc = jnp.maximum(z, near)
    u = camera.fx * x / zc + camera.cx
    v = camera.fy * y / zc + camera.cy
    xy = jnp.stack([u, v], axis=-1)

    inv_z = 1.0 / zc
    inv_z2 = inv_z * inv_z
    j00 = camera.fx * inv_z
    j02 = -camera.fx * x * inv_z2
    j11 = camera.fy * inv_z
    j12 = -camera.fy * y * inv_z2

    # A = J M is 2×3 per gaussian: Σ₂ = A Aᵀ + eps2d·I, built from row dots
    # — never a (N, 3, 3) temp (TPU pads trailing (3, 3) dims ~57×).
    a0 = j00[..., None] * m0 + j02[..., None] * m2          # (N, 3)
    a1 = j11[..., None] * m1 + j12[..., None] * m2
    a = jnp.sum(a0 * a0, axis=-1) + eps2d
    b = jnp.sum(a0 * a1, axis=-1)
    c = jnp.sum(a1 * a1, axis=-1) + eps2d

    det = a * c - b * b
    det_safe = jnp.maximum(det, 1e-12)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det_safe, 0.01))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam)) + dilate

    valid = (z > near) & (det > 0.0)
    inside = (
        (u + radius > 0.0)
        & (u - radius < camera.width)
        & (v + radius > 0.0)
        & (v - radius < camera.height)
    )
    valid = valid & inside
    radius = jnp.where(valid, radius, 0.0)
    return Projected(xy=xy, depth=z, conic=conic, radius=radius, valid=valid)


def _rotation_rows(q: jnp.ndarray):
    """Rows of R(q) for batched wxyz quaternions, as three (N, 3) arrays
    (normalizing q) — the covariance square root without a (N, 3, 3) temp."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                    2 * (x * z + w * y)], axis=-1)
    r1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                    2 * (y * z - w * x)], axis=-1)
    r2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                    1 - 2 * (x * x + y * y)], axis=-1)
    return r0, r1, r2


def project_raw(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    log_scales: jnp.ndarray,
    camera: Camera,
    near: float = 0.01,
    eps2d: float = BLUR_2D,
    dilate: float = 0.0,
) -> Projected:
    """EWA projection straight from raw gaussian parameters.

    Mathematically identical to ``project(means, compute_cov(quats,
    exp(log_scales)), camera)`` but fused: with M = R_w2c·R(q)·S the 2D
    covariance is Σ₂ = (J M)(J M)ᵀ + eps2d·I, and the rotation composition
    R_w2c·R(q) is one quaternion product — so the largest temporary is
    (N, 4) instead of the (N, 3, 3) world covariance whose trailing-dims TPU
    layout pads ~57× (the round-2 moving-camera OOM, bench.py variant).
    Fully differentiable w.r.t. all parameters and the camera.
    """
    from sim_a_splat_tpu.ops import quaternion as quat

    w2c = camera.pose.inverse()
    R = w2c.rotation_matrix()
    p_cam = means @ R.T + w2c.t
    q_cam = quat.multiply(w2c.q, quats)
    r0, r1, r2 = _rotation_rows(q_cam)
    s = jnp.exp(log_scales)                                 # (N, 3)
    return _finish_projection(p_cam, r0 * s, r1 * s, r2 * s,
                              camera, near, eps2d, dilate)


def view_directions(means: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """Unit directions camera-origin → gaussian (for SH evaluation)."""
    d = means - camera.pose.t
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
