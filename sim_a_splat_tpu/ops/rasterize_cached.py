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


def build_tile_cache_raw(means, quats, log_scales, colors, opacities,
                         camera, config) -> TileCache:
    """Cache build via the fused raw-parameter projection (project_raw) —
    no (N, 3, 3) covariance temps."""
    from sim_a_splat_tpu.ops.projection import project_raw

    tx, ty = _grid(camera, config)
    proj = project_raw(means, quats, log_scales, camera)
    (gxy, gconic, gcol, gop, gdepth), counts, _ = gather_tile_lists(
        proj, colors, opacities, config, tx, ty)
    return TileCache(gxy, gconic, gcol, gop, gdepth, counts)


def build_tile_cache_raw_sh(means, quats, log_scales, sh_coeffs, opacities,
                            camera, config, sh_degree: int) -> TileCache:
    dirs = view_directions(means, camera)
    colors = sh_ops.eval_sh_color(sh_coeffs, dirs, sh_degree)
    return build_tile_cache_raw(means, quats, log_scales, colors, opacities,
                                camera, config)


def _sort_apply(keys: jnp.ndarray, payload: jnp.ndarray) -> jnp.ndarray:
    """Reorder ``payload`` (T, K, C) rows by ascending ``keys`` (T, K) int,
    using one multi-operand ``lax.sort`` — the fast way to apply a known
    permutation on TPU.  Round-1 profiling: a (T, 1152)-row
    ``take_along_axis`` gather costs ~9 ms/env on v5e while the equivalent
    11-operand sort costs <1 ms/env; XLA's TPU gather lowering is the
    single worst primitive in this pipeline, so permutations are applied
    by sort everywhere."""
    cols = tuple(payload[..., i] for i in range(payload.shape[-1]))
    out = lax.sort((keys,) + cols, dimension=1, num_keys=1)
    return jnp.stack(out[1:], axis=-1)


@jax.custom_vjp
def _permute_rows(payload, dest):
    """out[t, dest[t, s], :] = payload[t, s, :] for a permutation ``dest``.

    Forward: sort payload rows by ``dest``.  Backward: the exact VJP is
    ``grad[t, s] = ct[t, dest[t, s]]`` — applied as one int sort (inverting
    ``dest``) plus one sort of the cotangents, never a gather or the
    scatter-add XLA emits for a gather transpose (both are backward-pass
    bottlenecks on TPU)."""
    return _sort_apply(dest, payload)


def _permute_rows_fwd(payload, dest):
    return _sort_apply(dest, payload), dest


def _permute_rows_bwd(dest, ct):
    import numpy as _np

    K = dest.shape[1]
    iota = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), dest.shape)
    _, inv = lax.sort((dest, iota), dimension=1, num_keys=1)
    grad = _sort_apply(inv, ct)
    return grad, _np.zeros(dest.shape, jax.dtypes.float0)


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _pack_payload(c: TileCache) -> jnp.ndarray:
    """TileCache → (T, 10, K) field-major payload (the pallas kernels' input
    layout, rows [x, y, conic a b c, r, g, b, depth, opacity])."""
    payload = jnp.concatenate([
        c.gxy, c.gconic, c.gcol, c.gdepth[..., None], c.gop[..., None],
    ], axis=-1)
    return jnp.swapaxes(payload, 1, 2)


def merge_sorted_lists(static: TileCache, dyn: TileCache) -> TileCache:
    """Merge two depth-sorted per-tile list sets into one.

    Both inputs obey the gather_tile_lists contract (actives first, depth
    ascending, inactive entries opacity 0), so instead of re-sorting the
    concatenated lists (a 12-operand lax.sort — the round-1 hot spot) the
    merged position of every entry has the closed "merge path" form

        pos_static[i] = i + #{j : dkey[j] <  skey[i]}
        pos_dyn[j]    = j + #{i : skey[i] <= dkey[j]}

    with keys = depth (+inf for inactive).  Two lane-axis compare-reduces
    give the counts; the resulting destination permutation is applied by
    :func:`_permute_rows` (sort-apply forward, int-sort + sort-apply
    backward — no gathers, no scatters, see `_sort_apply`).
    """
    def cat(a, b):
        return jnp.concatenate([a, b], axis=1)

    skey = jnp.where(static.gop > 0.0, static.gdepth, jnp.inf)  # (T, Ks)
    dkey = jnp.where(dyn.gop > 0.0, dyn.gdepth, jnp.inf)        # (T, Kd)
    Ks = skey.shape[1]
    Kd = dkey.shape[1]

    # merge-path counts: strict < on one side, <= on the other keeps the
    # destination map a permutation even with equal keys (inf padding ties).
    # Two independently-oriented compare-reduces, each reducing over the
    # LAST (lane) axis, so XLA fuses compare+sum without materializing the
    # (T, Ks, Kd) mask (a shared mask with a middle-axis reduction was
    # measured 10× slower on TPU).
    cnt_d = jnp.sum(dkey[:, None, :] < skey[:, :, None],
                    axis=2, dtype=jnp.int32)               # (T, Ks)
    cnt_s = jnp.sum(skey[:, None, :] <= dkey[:, :, None],
                    axis=2, dtype=jnp.int32)               # (T, Kd)
    pos_s = jnp.arange(Ks, dtype=jnp.int32)[None, :] + cnt_d
    pos_d = jnp.arange(Kd, dtype=jnp.int32)[None, :] + cnt_s
    dest = cat(pos_s, pos_d)                               # (T, K) src → dst

    gop = cat(static.gop, dyn.gop)
    gdepth = cat(static.gdepth, dyn.gdepth)
    payload = jnp.concatenate([
        cat(static.gxy, dyn.gxy),
        cat(static.gconic, dyn.gconic),
        cat(static.gcol, dyn.gcol),
        gop[..., None], gdepth[..., None],
    ], axis=-1)                                            # (T, K, 10)
    merged = _permute_rows(payload, dest)
    return TileCache(
        gxy=merged[..., 0:2],
        gconic=merged[..., 2:5],
        gcol=merged[..., 5:8],
        gop=merged[..., 8], gdepth=merged[..., 9],
        counts=static.counts + dyn.counts,
    )


def build_static_composite(cache: TileCache, camera: Camera,
                           config: RasterConfig):
    """Composite the static cache alone → (rgb, depth_acc, trans) per tile.

    Computed once per train step next to :func:`build_tile_cache`; lets
    :func:`rasterize_with_cache` skip compositing (forward and backward)
    for every tile the dynamic gaussians don't touch — in the env loop
    that is most of the image (the reference's static ``/scene_ohne_robot``
    split, splat_handler.py:104-119).  Differentiable into the cache.
    """
    tx, _ = _grid(camera, config)
    return composite_dispatch(cache.gxy, cache.gconic, cache.gcol,
                              cache.gop, cache.gdepth, config, tx,
                              counts=cache.counts)


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
    static_composite=None,
    dyn_max_tiles: int | None = None,
    dyn_quats: jnp.ndarray | None = None,
    dyn_log_scales: jnp.ndarray | None = None,
):
    """Render static cache + dynamic gaussians → ((H, W, 3), RasterAux).

    Pass EITHER ``dyn_covs`` (3×3 world covariances) OR raw parameters
    ``dyn_quats``/``dyn_log_scales`` (with ``dyn_covs=None``) — the raw
    route projects through the fused :func:`project_raw` and never builds
    (N, 3, 3) temps.

    ``config.tile_capacity`` is the *static* capacity used when the cache
    was built; dynamic gaussians get their own ``dyn_capacity``.  The
    composite capacity is their sum (kept chunk-aligned by construction:
    pass chunk-multiples for both).

    ``static_composite`` (from :func:`build_static_composite`, same cache/
    camera/config) enables whole-tile skipping: tiles with zero dynamic
    entries reuse it instead of re-compositing the full static list, exact
    because their merged list IS the static list.  ``dyn_max_tiles``
    overrides ``config.max_tiles_per_gaussian`` for the dynamic binning
    (dynamic gaussians are typically small — fewer bbox slots ⇒ smaller
    binning sort).
    """
    ts = config.tile_size
    H, W = camera.height, camera.width
    tx, ty = _grid(camera, config)
    T = tx * ty

    dyn_cfg = config._replace(tile_capacity=dyn_capacity)
    if dyn_max_tiles is not None:
        dyn_cfg = dyn_cfg._replace(max_tiles_per_gaussian=dyn_max_tiles)
    if dyn_covs is None:
        from sim_a_splat_tpu.ops.projection import project_raw

        proj = project_raw(dyn_means, dyn_quats, dyn_log_scales, camera)
    else:
        proj = project(dyn_means, dyn_covs, camera)
    (dxy, dconic, dcol, dop, ddep), dcounts, dtrunc = gather_tile_lists(
        proj, dyn_colors, dyn_opacities, dyn_cfg, tx, ty)
    dyn = TileCache(dxy, dconic, dcol, dop, ddep, dcounts)

    use_fused = (
        config.fused_pair
        and config.backend in ("pallas", "pallas_interpret")
        and cache.gxy.shape[1] % 128 == 0 and dyn_capacity % 128 == 0
    )
    if use_fused:
        # merge-free interleaved kernel: composites the shared static lists
        # and the per-env dynamic lists jointly (ops/pallas_composite_pair),
        # never materializing the merged (T, Ks+Kd, 10) lists in HBM
        from sim_a_splat_tpu.ops.pallas_composite_pair import (
            composite_pallas_pair,
        )
        skip = (dcounts if static_composite is not None
                else jnp.ones((T,), jnp.int32))
        out = composite_pallas_pair(
            _pack_payload(cache), _pack_payload(dyn),
            cache.counts.astype(jnp.int32), dcounts.astype(jnp.int32),
            skip.astype(jnp.int32), config.tile_size, tx,
            config.sigma_cutoff, config.backend == "pallas_interpret",
            config.term_eps)
        rgb, depth_acc, trans = out[..., 0:3], out[..., 3], out[..., 4]
        merged_counts = cache.counts + dcounts
    else:
        merged = merge_sorted_lists(cache, dyn)
        rgb, depth_acc, trans = composite_dispatch(
            merged.gxy, merged.gconic, merged.gcol, merged.gop,
            merged.gdepth, config, tx, counts=merged.counts,
            skip=dcounts if static_composite is not None else None)
        merged_counts = merged.counts
    if static_composite is not None:
        s_rgb, s_depth, s_trans = static_composite
        touched = dcounts > 0
        rgb = jnp.where(touched[:, None, None], rgb, s_rgb)
        depth_acc = jnp.where(touched[:, None], depth_acc, s_depth)
        trans = jnp.where(touched[:, None], trans, s_trans)

    if background is None:
        background = jnp.zeros(3, dtype=rgb.dtype)
    rgb = rgb + trans[..., None] * background

    def untile(a):
        return untile_image(a, tx, ty, ts, H, W)

    K_static = cache.gxy.shape[1]
    aux = RasterAux(
        tile_counts=merged_counts,
        n_overflowed_tiles=jnp.sum(
            (cache.counts > K_static) | (dcounts > dyn_capacity)),
        n_slot_truncated=dtrunc,
        alpha=untile(1.0 - trans),
        depth=untile(depth_acc) / jnp.maximum(untile(1.0 - trans), 1e-10),
    )
    return untile(rgb), aux


def select_touched_tiles(dcounts: jnp.ndarray, sel_tiles: int, T: int):
    """Pick the ``sel_tiles`` tiles with the most dynamic entries.

    Returns (ids (TT,) int32 with pad = T after all real slots, counts_sel
    (TT,) int32 zero at pads, n_overflow: touched tiles that did not fit).
    Selection is exact whenever #touched ≤ sel_tiles (the production case);
    overflowing tiles fall back to the static composite and are counted.
    """
    iota = jnp.arange(T, dtype=jnp.int32)
    neg, order = lax.sort((-dcounts.astype(jnp.int32), iota), num_keys=1)
    ids = jnp.where(neg < 0, order, T)[:sel_tiles].astype(jnp.int32)
    counts_sel = jnp.maximum(-neg, 0)[:sel_tiles].astype(jnp.int32)
    n_overflow = (jnp.sum(dcounts > 0) - jnp.sum(neg[:sel_tiles] < 0)
                  ).astype(jnp.int32)
    return ids, counts_sel, n_overflow


def _gather_tile_lists_sel(proj, colors, opacities, sorted_gidx, starts,
                           counts, ids, Kd: int):
    """Per-tile list gather restricted to the selected tiles ``ids``.

    Returns (TT, 10, Kd) payload in the pallas kernel row layout
    [x, y, conic a b c, r, g, b, depth, opacity] with inactive entries'
    opacity zeroed."""
    k = jnp.arange(Kd, dtype=jnp.int32)
    starts_pad = jnp.concatenate([starts, starts[-1:]])       # id = T ⇒ pad
    counts_pad = jnp.concatenate(
        [counts, jnp.zeros((1,), counts.dtype)])
    s_sel = starts_pad[ids]                                   # (TT,)
    c_sel = jnp.minimum(counts_pad[ids], Kd)
    sel = jnp.clip(s_sel[:, None] + k[None, :], 0, sorted_gidx.shape[0] - 1)
    g = sorted_gidx[sel]                                      # (TT, Kd)
    payload = jnp.concatenate([
        proj.xy,                                              # 0:2
        proj.conic,                                           # 2:5
        colors,                                               # 5:8
        proj.depth[:, None],                                  # 8
        jnp.clip(opacities, 0.0, 1.0)[:, None],               # 9
    ], axis=1)
    lists = payload[g]                                        # (TT, Kd, 10)
    entry_valid = k[None, :] < c_sel[:, None]
    lists = lists.at[..., 9].set(
        jnp.where(entry_valid, lists[..., 9], 0.0))
    return jnp.swapaxes(lists, 1, 2), c_sel                   # (TT, 10, Kd)


def rasterize_cache_sel_batch(
    cache: TileCache,
    static_composite,
    dyn_means: jnp.ndarray,       # (B, Nd, 3)
    dyn_quats: jnp.ndarray,       # (B, Nd, 4)
    dyn_log_scales: jnp.ndarray,  # (B, Nd, 3)
    dyn_colors: jnp.ndarray,      # (B, Nd, 3)
    dyn_opacities: jnp.ndarray,   # (B, Nd)
    camera: Camera,
    config: RasterConfig,
    dyn_capacity: int = 128,
    sel_tiles: int = 128,
    dyn_max_tiles: int | None = None,
    background: jnp.ndarray | None = None,
):
    """Batched cached render through the selected-tile fused kernel.

    The explicitly-batched production path: per env it projects + bins the
    dynamic gaussians, selects the ≤ ``sel_tiles`` tiles they touch, and
    composites ONLY those tiles against the shared static cache with the
    scalar-prefetch pallas kernel (ops/pallas_composite_sel.py); untouched
    tiles reuse ``static_composite``.  Explicit batch (no vmap) because the
    kernel's grid is (B, TT) with a prefetched tile-id table — replaces the
    reference hot loop's per-camera browser render (splat_env_wrapper.py:
    140-159) for a whole env batch in one launch.

    Returns ((B, 3, H, W) CHW images — channel-major end to end, matching
    the camera_{i} obs contract and avoiding lane-padded (…, 3) layouts —
    and a RasterAux with batched fields).
    """
    from sim_a_splat_tpu.ops.pallas_composite_sel import composite_pair_sel
    from sim_a_splat_tpu.ops.projection import project_raw

    ts = config.tile_size
    H, W = camera.height, camera.width
    tx, ty = _grid(camera, config)
    T = tx * ty
    B = dyn_means.shape[0]
    Kd = dyn_capacity
    if static_composite is None:
        raise ValueError("rasterize_cache_sel_batch requires the static "
                         "composite (unselected tiles fall back to it)")
    # the sel kernel iterates lists in CHUNK=128 slabs with no remainder
    # handling: a non-multiple capacity would silently truncate (static) or
    # drop every dynamic gaussian (dyn_capacity < 128 ⇒ zero chunks) — the
    # same conditions the pair path guards via ``use_fused``
    from sim_a_splat_tpu.ops.pallas_composite import CHUNK as _SEL_CHUNK
    Ks_cap = cache.gxy.shape[1]
    if Ks_cap % _SEL_CHUNK != 0:
        raise ValueError(
            f"rasterize_cache_sel_batch: static tile capacity {Ks_cap} must "
            f"be a multiple of the kernel chunk {_SEL_CHUNK}")
    if Kd % _SEL_CHUNK != 0:
        raise ValueError(
            f"rasterize_cache_sel_batch: dyn_capacity {Kd} must be a "
            f"multiple of the kernel chunk {_SEL_CHUNK}")
    if config.backend not in ("pallas", "pallas_interpret"):
        raise ValueError(
            "rasterize_cache_sel_batch requires a pallas backend "
            f"(config.backend={config.backend!r}); use rasterize_with_cache "
            "for the XLA merge path")

    dyn_cfg = config._replace(tile_capacity=dyn_capacity)
    if dyn_max_tiles is not None:
        dyn_cfg = dyn_cfg._replace(max_tiles_per_gaussian=dyn_max_tiles)

    from sim_a_splat_tpu.ops.rasterize_tiles import _bin_gaussians

    def bin_one(m, q, l, c, o):
        proj = project_raw(m, q, l, camera)
        (_, sorted_gidx, starts, counts, trunc) = _bin_gaussians(
            proj, dyn_cfg, tx, ty)
        ids, c_sel0, n_over = select_touched_tiles(counts, sel_tiles, T)
        dpay, c_sel = _gather_tile_lists_sel(
            proj, c, o, sorted_gidx, starts, counts, ids, Kd)
        return dpay, ids, c_sel, counts, trunc, n_over

    dpay, ids, counts_d, dcounts, dtrunc, n_over = jax.vmap(bin_one)(
        dyn_means, dyn_quats, dyn_log_scales, dyn_colors, dyn_opacities)

    Ks = cache.gxy.shape[1]
    spay_pad = jnp.concatenate(
        [_pack_payload(cache),
         jnp.zeros((1, 10, Ks), cache.gxy.dtype)], axis=0)
    counts_s_pad = jnp.concatenate(
        [cache.counts.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])

    interpret = config.backend == "pallas_interpret"
    out = composite_pair_sel(spay_pad, dpay, ids, counts_s_pad, counts_d,
                             ts, tx, config.sigma_cutoff, interpret,
                             config.term_eps, config.sel_exact_fwd,
                             config.sel_exact_bwd)            # (B, T+1, 8, P)

    # selected-tile mask; unselected rows of `out` are uninitialized.
    # Everything stays channel-major (…, 8|1, P): the P=ts² pixel axis is
    # the lane dim, so no array here pads (a trailing 3/8 dim pads to 128
    # lanes — 16-42× HBM expansion, the round-4 B=128 OOM).
    sel_mask = jnp.zeros((B, T + 1), bool).at[
        jnp.arange(B, dtype=jnp.int32)[:, None], ids].set(True)[:, :T]
    s_rgb, s_depth, s_trans = static_composite                # (T,P,3) etc.
    P = ts * ts
    s_all = jnp.concatenate([
        jnp.swapaxes(s_rgb, 1, 2),                            # (T, 3, P)
        s_depth[:, None, :], s_trans[:, None, :],
        jnp.zeros((T, 3, P), s_rgb.dtype)], axis=1)           # (T, 8, P)
    sel8 = jnp.where(sel_mask[..., None, None], out[:, :T], s_all[None])

    if background is None:
        background = jnp.zeros(3, dtype=sel8.dtype)

    def untile(a):
        return untile_image(a, tx, ty, ts, H, W)

    untile_b = jax.vmap(untile)                               # (B,T,P)→(B,H,W)
    trans = sel8[:, :, 4, :]
    imgs = jnp.stack(
        [untile_b(sel8[:, :, c, :] + trans * background[c])
         for c in range(3)], axis=1)                          # (B, 3, H, W)
    alpha = untile_b(1.0 - trans)
    depth = untile_b(sel8[:, :, 3, :]) / jnp.maximum(alpha, 1e-10)
    aux = RasterAux(
        tile_counts=cache.counts[None] + dcounts,
        n_overflowed_tiles=jnp.sum(dcounts > Kd),
        n_slot_truncated=jnp.sum(dtrunc),
        alpha=alpha,
        depth=depth,
        n_sel_dropped_tiles=jnp.sum(n_over),
    )
    return imgs, aux


def rasterize_with_cache_sh(cache, dyn_means, dyn_covs, dyn_sh, dyn_opac,
                            camera, sh_degree: int, config,
                            dyn_capacity: int = 128, background=None,
                            static_composite=None,
                            dyn_max_tiles: int | None = None,
                            dyn_quats=None, dyn_log_scales=None):
    dirs = view_directions(dyn_means, camera)
    colors = sh_ops.eval_sh_color(dyn_sh, dirs, sh_degree)
    return rasterize_with_cache(cache, dyn_means, dyn_covs, colors, dyn_opac,
                                camera, config, dyn_capacity, background,
                                static_composite=static_composite,
                                dyn_max_tiles=dyn_max_tiles,
                                dyn_quats=dyn_quats,
                                dyn_log_scales=dyn_log_scales)
