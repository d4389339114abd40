"""Real spherical-harmonics color evaluation for 3D Gaussian splats.

The reference renders splatfacto models trained with ``sh_degree: 3``
(assets/divar113vhw/splatfacto/.../config.yml:200-204) and exposes the DC-only
shortcut ``SH2RGB(sh) = sh*C0 + 0.5`` (ns_utils/nerfstudio_utils.py:43-47).
Both paths are provided here, fully batched and jittable.

Basis constants follow the standard real-SH convention used by gsplat /
INRIA 3DGS.  Layout of ``sh`` coefficients: (..., K, 3) with K = (deg+1)²,
band-major (DC first, then the 3 deg-1 terms, 5 deg-2, 7 deg-3).
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def sh_to_rgb(sh_dc: jnp.ndarray) -> jnp.ndarray:
    """DC-band-only color: matches reference ``SH2RGB`` exactly."""
    return sh_dc * C0 + 0.5


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / C0


def num_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate SH color in view directions.

    Args:
      sh:   (..., K, 3) coefficients with K >= (degree+1)².
      dirs: (..., 3) unit view directions (gaussian center − camera origin).
      degree: 0..3, static.

    Returns:
      (..., 3) colors *before* the +0.5 offset/clamp (caller applies
      ``+ 0.5`` then clamps to ≥0, the gsplat "classic" convention).
    """
    result = C0 * sh[..., 0, :]
    if degree >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (
            result
            - C1 * y * sh[..., 1, :]
            + C1 * z * sh[..., 2, :]
            - C1 * x * sh[..., 3, :]
        )
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (
            result
            + C2[0] * xy * sh[..., 4, :]
            + C2[1] * yz * sh[..., 5, :]
            + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
            + C2[3] * xz * sh[..., 7, :]
            + C2[4] * (xx - yy) * sh[..., 8, :]
        )
    if degree >= 3:
        result = (
            result
            + C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
            + C3[1] * xy * z * sh[..., 10, :]
            + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
            + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
            + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
            + C3[5] * z * (xx - yy) * sh[..., 14, :]
            + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
        )
    return result


def eval_sh_color(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Full splat color: eval_sh + 0.5, clamped at 0 (gsplat classic)."""
    return jnp.maximum(eval_sh(sh, dirs, degree) + 0.5, 0.0)


def eval_sh_color_split(sh_dc: jnp.ndarray, sh_rest: jnp.ndarray | None,
                        dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """``eval_sh_color`` on the scene's native split storage.

    Identical math to ``eval_sh_color(concat([sh_dc[:, None], sh_rest], 1),
    dirs, degree)`` but never materializes the (N, K, 3) concat — round-3
    profiling showed the concat + its slice/pad VJP + the layout copies XLA
    inserts around the (N, 15, 3) operand cost ~6 ms/step at N=93k on v5e.
    ``sh_dc`` is (..., 3); ``sh_rest`` is (..., K-1, 3) or None (degree 0).
    """
    result = C0 * sh_dc
    if degree >= 1:
        r = sh_rest
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (
            result
            - C1 * y * r[..., 0, :]
            + C1 * z * r[..., 1, :]
            - C1 * x * r[..., 2, :]
        )
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (
            result
            + C2[0] * xy * r[..., 3, :]
            + C2[1] * yz * r[..., 4, :]
            + C2[2] * (2.0 * zz - xx - yy) * r[..., 5, :]
            + C2[3] * xz * r[..., 6, :]
            + C2[4] * (xx - yy) * r[..., 7, :]
        )
    if degree >= 3:
        result = (
            result
            + C3[0] * y * (3.0 * xx - yy) * r[..., 8, :]
            + C3[1] * xy * z * r[..., 9, :]
            + C3[2] * y * (4.0 * zz - xx - yy) * r[..., 10, :]
            + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * r[..., 11, :]
            + C3[4] * x * (4.0 * zz - xx - yy) * r[..., 12, :]
            + C3[5] * z * (xx - yy) * r[..., 13, :]
            + C3[6] * x * (xx - 3.0 * yy) * r[..., 14, :]
        )
    return jnp.maximum(result + 0.5, 0.0)
