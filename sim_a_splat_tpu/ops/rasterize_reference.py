"""Slow, dense golden renderer for 3D Gaussian splatting.

Every later kernel (the XLA tile rasterizer and the Pallas kernels) is
verified against this: it evaluates *every* gaussian at *every* pixel with
no tiling, binning, or capacity limits, using the same math as the gsplat
"classic" CUDA rasterizer the reference relies on
(ns_utils/nerfstudio_utils.py:166-171).

O(N·H·W) — use only on small scenes/resolutions (tests, verification).
Differentiable end-to-end; sequential front-to-back compositing is replaced
by the mathematically identical cumulative-product form:

    w_k = α_k · Π_{j<k} (1 − α_j)        (depth-ordered)

which maps to one ``cumprod`` on TPU instead of a serial loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from sim_a_splat_tpu.ops import sh as sh_ops
from sim_a_splat_tpu.ops.projection import Camera, project

# gsplat classic constants
ALPHA_CLAMP = 0.999      # max per-gaussian alpha
ALPHA_MIN = 1.0 / 255.0  # contributions below this are dropped


def render_reference(
    means: jnp.ndarray,
    covs: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    camera: Camera,
    background: jnp.ndarray | None = None,
    return_depth: bool = False,
    sigma_cutoff: float | None = None,
):
    """Render (H, W, 3) image (+ optionally depth/alpha) from world-space gaussians.

    Args:
      means:     (N, 3)
      covs:      (N, 3, 3) world-space covariances (activations applied).
      colors:    (N, 3) per-gaussian RGB in [0, 1] (SH already evaluated).
      opacities: (N,) in [0, 1].
      camera:    pinhole camera.
      background: (3,) RGB, defaults to black.
    """
    H, W = camera.height, camera.width
    proj = project(means, covs, camera)

    # Depth-sort (front to back). Invalid gaussians to the back with +inf.
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    xy = proj.xy[order]
    conic = proj.conic[order]
    valid = proj.valid[order]
    cols = colors[order]
    opac = jnp.clip(opacities[order], 0.0, 1.0)
    depth_sorted = proj.depth[order]

    # Pixel centers (gsplat convention: pixel (i, j) center at (j+0.5, i+0.5)).
    px = jnp.arange(W, dtype=jnp.float32) + 0.5
    py = jnp.arange(H, dtype=jnp.float32) + 0.5
    pgx, pgy = jnp.meshgrid(px, py)                    # (H, W)
    pix = jnp.stack([pgx, pgy], axis=-1).reshape(-1, 2)  # (P, 2)

    # (P, N) gaussian evaluation.
    d = pix[:, None, :] - xy[None, :, :]               # (P, N, 2)
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    power = -0.5 * (a[None, :] * dx * dx + c[None, :] * dy * dy) - b[None, :] * dx * dy
    alpha = opac[None, :] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(alpha, ALPHA_CLAMP)
    keep = (alpha >= ALPHA_MIN) & valid[None, :] & (power <= 0.0)
    if sigma_cutoff is not None:
        # nσ hard cutoff — matches the implicit bbox truncation of the tile
        # rasterizer so the two can be compared exactly in tests.
        keep &= power >= -0.5 * sigma_cutoff**2
    alpha = jnp.where(keep, alpha, 0.0)

    one_minus = 1.0 - alpha
    # Exclusive cumulative transmittance along the depth-sorted axis.
    trans = jnp.cumprod(one_minus, axis=-1)
    trans_excl = jnp.concatenate(
        [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1
    )
    w = alpha * trans_excl                             # (P, N)

    rgb = w @ cols                                     # (P, 3)
    alpha_total = jnp.sum(w, axis=-1)                  # (P,)
    if background is None:
        background = jnp.zeros(3, dtype=rgb.dtype)
    rgb = rgb + (1.0 - alpha_total)[:, None] * background

    img = rgb.reshape(H, W, 3)
    if not return_depth:
        return img
    depth = (w @ depth_sorted[:, None])[:, 0]
    depth = depth / jnp.maximum(alpha_total, 1e-10)
    return img, depth.reshape(H, W), alpha_total.reshape(H, W)


def render_reference_sh(
    means, covs, sh_coeffs, opacities, camera, sh_degree: int,
    background=None, **kw,
):
    """Reference render with view-dependent SH colors (sh_degree 0..3)."""
    from sim_a_splat_tpu.ops.projection import view_directions

    dirs = view_directions(means, camera)
    colors = sh_ops.eval_sh_color(sh_coeffs, dirs, sh_degree)
    return render_reference(means, covs, colors, opacities, camera, background, **kw)
