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


def view_directions(means: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """Unit directions camera-origin → gaussian (for SH evaluation)."""
    d = means - camera.pose.t
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
