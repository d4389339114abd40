"""Static-scene binning cache: bin the background once, per frame bin only
what moves.

In the env loop the overwhelming share of gaussians never moves (the
reference's static ``/scene_ohne_robot`` handle, splat_handler.py:104-119:
~97% of the divar scene) and observation cameras of type viewport/static
have fixed poses.  The per-frame work of the plain rasterizer — projecting
and sort-binning ALL N gaussians — is therefore mostly recomputation of a
constant.

Here the static subset's depth-sorted per-tile lists are built once
(:func:`build_tile_cache`); each frame projects + bins only the dynamic
gaussians (robot links, task object, agent — 10³-10⁴) and merges the two
sorted lists per tile with one (T, K_bg+K_dyn) lax.sort.  This turns the
dominant O(N·M log) global sort into an O(N_dyn·M log) sort plus a cheap
per-tile merge, independent of background size.

Only valid for cameras with fixed pose; moving (link-attached) cameras use
the plain path.  Differentiable w.r.t. both dynamic params and the cached
static lists (the cache entries are ordinary array inputs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from sim_a_splat_tpu.ops import sh as sh_ops
from sim_a_splat_tpu.ops.projection import Camera, project, view_directions
from sim_a_splat_tpu.ops.rasterize_tiles import (
    RasterAux, RasterConfig, composite_dispatch, gather_tile_lists,
    untile_image,
)


class TileCache(NamedTuple):
    """Depth-sorted per-tile gaussian lists for a fixed (scene, camera)."""

    gxy: jnp.ndarray      # (T, K, 2)
    gconic: jnp.ndarray   # (T, K, 3)
    gcol: jnp.ndarray     # (T, K, 3)
    gop: jnp.ndarray      # (T, K) — 0 for inactive entries
    gdepth: jnp.ndarray   # (T, K)
    counts: jnp.ndarray   # (T,)


def _grid(camera: Camera, config: RasterConfig):
    ts = config.tile_size
    tx = -(-camera.width // ts)
    ty = -(-camera.height // ts)
    return tx, ty


def build_tile_cache(
    means: jnp.ndarray,
    covs: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    camera: Camera,
    config: RasterConfig,
) -> TileCache:
    """Bin a (static) gaussian set against a fixed camera once."""
    tx, ty = _grid(camera, config)
    proj = project(means, covs, camera)
    (gxy, gconic, gcol, gop, gdepth), counts, _ = gather_tile_lists(
        proj, colors, opacities, config, tx, ty)
    return TileCache(gxy, gconic, gcol, gop, gdepth, counts)


def build_tile_cache_sh(means, covs, sh_coeffs, opacities, camera, config,
                        sh_degree: int) -> TileCache:
    dirs = view_directions(means, camera)
    colors = sh_ops.eval_sh_color(sh_coeffs, dirs, sh_degree)
    return build_tile_cache(means, covs, colors, opacities, camera, config)


@jax.custom_vjp
def _sort_rows(key, payload):
    """Per-row sort of ``payload`` (T, K, C) columns by ``key`` (T, K).

    Forward: one fused multi-operand ``lax.sort`` (the fast path on TPU).
    Backward: the sort applies a permutation, so the exact VJP is a gather
    of the cotangents by the *inverse* permutation (one int sort + one
    gather) — never the scatter XLA emits when differentiating sort, which
    is the backward-pass bottleneck on TPU (same motivation as
    _tile_gather in rasterize_tiles.py)."""
    out, _ = _sort_rows_fwd(key, payload)
    return out


def _sort_rows_fwd(key, payload):
    K = key.shape[1]
    iota = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), key.shape)
    cols = tuple(payload[..., i] for i in range(payload.shape[-1]))
    sorted_ = lax.sort((lax.stop_gradient(key), iota) + cols,
                       dimension=1, num_keys=1)
    return jnp.stack(sorted_[2:], axis=-1), sorted_[1]     # (out, perm)


def _sort_rows_bwd(perm, ct):
    import numpy as _np

    K = perm.shape[1]
    iota = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), perm.shape)
    _, inv = lax.sort((perm, iota), dimension=1, num_keys=1)
    grad = jnp.take_along_axis(ct, inv[..., None], axis=1)
    return jnp.zeros(perm.shape, ct.dtype), grad


_sort_rows.defvjp(_sort_rows_fwd, _sort_rows_bwd)


def merge_sorted_lists(static: TileCache, dyn: TileCache) -> TileCache:
    """Merge two depth-sorted per-tile list sets into one (single fused
    sort per tile over the concatenated capacity; inactive entries sink to
    the end via +inf keys; scatter-free backward via :func:`_sort_rows`)."""
    def cat(a, b):
        return jnp.concatenate([a, b], axis=1)

    gop = cat(static.gop, dyn.gop)
    gdepth = cat(static.gdepth, dyn.gdepth)
    key = jnp.where(gop > 0.0, gdepth, jnp.inf)
    payload = jnp.concatenate([
        cat(static.gxy, dyn.gxy),
        cat(static.gconic, dyn.gconic),
        cat(static.gcol, dyn.gcol),
        gop[..., None], gdepth[..., None],
    ], axis=-1)                                            # (T, K, 10)
    merged = _sort_rows(key, payload)
    return TileCache(
        gxy=merged[..., 0:2],
        gconic=merged[..., 2:5],
        gcol=merged[..., 5:8],
        gop=merged[..., 8], gdepth=merged[..., 9],
        counts=static.counts + dyn.counts,
    )


def rasterize_with_cache(
    cache: TileCache,
    dyn_means: jnp.ndarray,
    dyn_covs: jnp.ndarray,
    dyn_colors: jnp.ndarray,
    dyn_opacities: jnp.ndarray,
    camera: Camera,
    config: RasterConfig,
    dyn_capacity: int = 128,
    background: jnp.ndarray | None = None,
):
    """Render static cache + dynamic gaussians → ((H, W, 3), RasterAux).

    ``config.tile_capacity`` is the *static* capacity used when the cache
    was built; dynamic gaussians get their own ``dyn_capacity``.  The
    composite capacity is their sum (kept chunk-aligned by construction:
    pass chunk-multiples for both).
    """
    ts = config.tile_size
    H, W = camera.height, camera.width
    tx, ty = _grid(camera, config)
    T = tx * ty

    dyn_cfg = config._replace(tile_capacity=dyn_capacity)
    proj = project(dyn_means, dyn_covs, camera)
    (dxy, dconic, dcol, dop, ddep), dcounts, dtrunc = gather_tile_lists(
        proj, dyn_colors, dyn_opacities, dyn_cfg, tx, ty)
    dyn = TileCache(dxy, dconic, dcol, dop, ddep, dcounts)
    merged = merge_sorted_lists(cache, dyn)

    rgb, depth_acc, trans = composite_dispatch(
        merged.gxy, merged.gconic, merged.gcol, merged.gop, merged.gdepth,
        config, tx, counts=merged.counts)

    if background is None:
        background = jnp.zeros(3, dtype=rgb.dtype)
    rgb = rgb + trans[..., None] * background

    def untile(a):
        return untile_image(a, tx, ty, ts, H, W)

    K_static = cache.gxy.shape[1]
    aux = RasterAux(
        tile_counts=merged.counts,
        n_overflowed_tiles=jnp.sum(
            (cache.counts > K_static) | (dcounts > dyn_capacity)),
        n_slot_truncated=dtrunc,
        alpha=untile(1.0 - trans),
        depth=untile(depth_acc) / jnp.maximum(untile(1.0 - trans), 1e-10),
    )
    return untile(rgb), aux


def rasterize_with_cache_sh(cache, dyn_means, dyn_covs, dyn_sh, dyn_opac,
                            camera, sh_degree: int, config,
                            dyn_capacity: int = 128, background=None):
    dirs = view_directions(dyn_means, camera)
    colors = sh_ops.eval_sh_color(dyn_sh, dirs, sh_degree)
    return rasterize_with_cache(cache, dyn_means, dyn_covs, colors, dyn_opac,
                                camera, config, dyn_capacity, background)
