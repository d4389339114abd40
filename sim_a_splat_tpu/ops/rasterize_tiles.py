"""Fast tile-based differentiable rasterizer for 3D Gaussian splatting.

TPU-native re-design of the gsplat CUDA rasterizer the reference invokes via
nerfstudio (ns_utils/nerfstudio_utils.py:166-171) and the browser WebGL
renderer behind ``client.get_render`` (splat_env_wrapper.py:148-157).

The CUDA original is built on dynamic memory and atomics (variable-length
per-tile gaussian lists, atomic gradient accumulation).  Neither exists on
TPU, so the pipeline is reformulated with fixed shapes and sort/segment
primitives that XLA compiles well:

  1. project           — EWA projection of all N gaussians (ops/projection.py)
  2. tile binning      — each gaussian emits up to M (tile, depth, idx)
                         tuples covering its 3σ bounding box;
                         ``lax.sort(num_keys=2)`` orders them by
                         (tile, depth); per-tile segments are located with
                         two ``searchsorted`` calls (no scatter, no atomics)
  3. per-tile gather   — fixed capacity K nearest gaussians per tile
                         (depth-sorted ⇒ truncation drops the farthest)
  4. compositing       — ``lax.scan`` over K/chunk chunks; within a chunk the
                         front-to-back recurrence is the closed form
                         w = α·cumprod(1−α)·T_carry, and the color
                         accumulation is a (P×chunk)·(chunk×3) matmul (MXU).
                         The scan body is wrapped in ``jax.checkpoint`` so
                         the backward pass recomputes per-chunk alphas from
                         the chunk-boundary transmittances instead of
                         storing the (T, P, K) alpha tensor (the TPU
                         equivalent of gsplat's recompute-in-backward).

Everything is fixed-shape ⇒ jit/vmap/shard_map-compatible; truncation is
reported via :class:`RasterAux` instead of silently dropped (SURVEY.md §7
"hard parts").  Differentiable w.r.t. gaussian parameters and camera; the
binning/sort indices are integer data and act as constants in the backward
pass, exactly like the CUDA rasterizer's sorted lists.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from sim_a_splat_tpu.ops import sh as sh_ops
from sim_a_splat_tpu.ops.projection import Camera, Projected, project, view_directions
from sim_a_splat_tpu.ops.rasterize_reference import ALPHA_CLAMP, ALPHA_MIN


class RasterConfig(NamedTuple):
    """Static rasterizer configuration (hashable ⇒ safe as a jit static)."""

    tile_size: int = 16            # pixels per tile side
    tile_capacity: int = 256       # K: max gaussians composited per tile
    max_tiles_per_gaussian: int = 16  # M: bbox slots per gaussian
    chunk: int = 64                # compositing chunk (scan step)
    sigma_cutoff: Optional[float] = None  # drop contributions beyond nσ
    backend: str = "xla"           # compositing: "xla" | "pallas" | "pallas_interpret"
    term_eps: Optional[float] = None  # pallas early-stop transmittance (gsplat: 1e-4)
    fused_pair: bool = True        # cached path: merge-free interleaved kernel
    # Selected-tile fused kernel (pallas_composite_sel) MXU precision for
    # the log-transmittance contractions: True = full-f32 HIGHEST (6 bf16
    # passes), "split" = 3-term hi/mid/lo-bf16 split against the 0/1
    # indicator operand (f32-exact in 3 default passes, ~2× cheaper than
    # HIGHEST's 6 — see _dot; round-4 default), False = 1-pass bf16.  Backward keeps default precision — gradients move by
    # ~the bf16 unit (≤0.5 %), far below the pair-vs-merge formula spread
    # (PRECISION.md).
    sel_exact_fwd: object = "split"
    sel_exact_bwd: object = False
    # Radius-aware binning buckets: ((M_b, frac_b), ...) ascending in M_b.
    # Gaussians are ordered by tile-footprint size; the frac_b·N with the
    # largest footprints get M_b slots from the largest bucket down (the
    # smallest bucket takes the remainder — its frac is ignored).  Shrinks
    # the binning sort from N·M to Σ n_b·M_b elements; most gaussians touch
    # ≪ M tiles.  None ⇒ uniform M = max_tiles_per_gaussian.
    buckets: Optional[tuple] = None


class RasterAux(NamedTuple):
    """Truncation accounting (the fixed-shape analogue of CUDA's exact lists).

    Two classes of inexactness, deliberately separated (round 4):
    - BOUNDED: ``n_overflowed_tiles`` (depth-sorted list cut at capacity —
      the nearest K kept, the tail's contribution is bounded by the
      transmittance after K entries, i.e. ~term_eps) and
      ``n_slot_truncated`` (bbox emission clipped to the bucket's slot
      count, nearest-origin tiles kept).  Policy knobs, reported.
    - SEVERE: ``n_sel_dropped_tiles`` (selected-tile path only: touched
      tiles beyond ``sel_tiles`` fall back to the static composite — their
      dynamics VANISH, zero gradient).  Must be 0 in production; surfaced
      as ``info['render_overflow']`` by the env wrapper.
    """

    tile_counts: jnp.ndarray        # (T,) gaussians binned per tile —
                                    # (B, T) per-env from batched renders
                                    # (rasterize_cache_sel_batch)
    n_overflowed_tiles: jnp.ndarray  # tiles with count > capacity K
    n_slot_truncated: jnp.ndarray    # gaussians whose tile bbox exceeded M
    alpha: jnp.ndarray              # (H, W) final opacity
    depth: jnp.ndarray              # (H, W) alpha-weighted mean depth
    n_sel_dropped_tiles: object = 0  # sel path: tiles whose dynamics were
                                     # entirely dropped (sel_tiles overflow)


def _emit_tiles(tx0, ty0, bw, nt, rank, gid, M, tx, T, N):
    """Emit up to ``M`` fused (tile·N + rank) keys per gaussian (row-major
    over the bbox; entries past the footprint get the sentinel key T·N)."""
    m = jnp.arange(M, dtype=jnp.int32)
    dx = m[None, :] % bw[:, None]
    dy = m[None, :] // bw[:, None]
    slot_valid = m[None, :] < nt[:, None]
    tile = (ty0[:, None] + dy) * tx + (tx0[:, None] + dx)
    tile = jnp.where(slot_valid, tile, T).astype(jnp.int32)  # T = sentinel
    key = tile * N + rank[:, None]
    gidx = jnp.broadcast_to(gid[:, None], (gid.shape[0], M))
    return key.reshape(-1), gidx.reshape(-1)


def _bin_gaussians(proj: Projected, config: RasterConfig, tx: int, ty: int):
    """(tile, depth)-sorted gaussian ids + per-tile segment starts/counts.

    Keys are fused into a single exact int32 ``tile · N + depth_rank``:
    the (E)-element sort is the binning hot spot and XLA's TPU sort cost
    scales with operand count and key count; one integer key + gidx payload
    is ~40% cheaper than (tile, depth) two-key / 3-operand.  depth_rank (the
    gaussian's position in the global depth order, from one cheap N-element
    pre-sort) preserves the exact (tile, depth) order because every gaussian
    has one depth: within a tile, rank order == depth order.

    With ``config.buckets``, gaussians are first ordered by descending tile
    footprint (one multi-operand N-element sort) and emission slots are
    allocated per bucket — E = Σ n_b·M_b instead of N·M.  A gaussian whose
    footprint exceeds its bucket's M_b keeps its nearest-origin tiles and is
    counted in n_slot_truncated (same accounting as the uniform path).
    """
    ts = config.tile_size
    M = config.max_tiles_per_gaussian
    T = tx * ty
    N = proj.xy.shape[0]
    if (T + 1) * N >= 2**31:
        raise ValueError(
            f"binning key overflow: (T+1)·N = {(T + 1) * N} ≥ 2^31 — "
            "shard the gaussians (parallel/render_sharding.py) or reduce N")

    x, y = proj.xy[..., 0], proj.xy[..., 1]
    r = proj.radius
    tx0 = jnp.clip(jnp.floor((x - r) / ts), 0, tx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x + r) / ts), 0, tx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / ts), 0, ty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y + r) / ts), 0, ty - 1).astype(jnp.int32)
    bw = tx1 - tx0 + 1
    bh = ty1 - ty0 + 1
    nt = jnp.where(proj.valid, bw * bh, 0)                  # tiles touched

    iota_n = jnp.arange(N, dtype=jnp.int32)
    _, depth_order = lax.sort((proj.depth, iota_n), num_keys=1)
    _, rank = lax.sort((depth_order, iota_n), num_keys=1)

    if not config.buckets:
        keys, gids = _emit_tiles(tx0, ty0, bw, nt, rank, iota_n, M, tx, T, N)
        n_slot_truncated = jnp.sum(nt > M)
    else:
        buckets = sorted(config.buckets)                    # ascending M_b
        # order by descending footprint; carry every emission input through
        # the one sort (multi-operand N-sort ≪ any gather on TPU)
        _, stx0, sty0, sbw, snt, srank, sgid = lax.sort(
            (-nt, tx0, ty0, bw, nt, rank, iota_n), num_keys=1)
        sizes = [max(int(round(f * N)), 0) for _, f in buckets]
        sizes[0] = max(N - sum(sizes[1:]), 0)               # remainder
        keys_l, gids_l = [], []
        trunc = jnp.zeros((), jnp.int32)
        # descending-footprint order ⇒ the largest-M bucket takes the FRONT
        lo = 0
        for (M_b, _), n_b in zip(reversed(buckets), reversed(sizes)):
            if n_b == 0:
                continue
            sl = slice(lo, lo + n_b)
            k, g = _emit_tiles(stx0[sl], sty0[sl], sbw[sl], snt[sl],
                               srank[sl], sgid[sl], min(M_b, M), tx, T, N)
            keys_l.append(k)
            gids_l.append(g)
            trunc += jnp.sum(snt[sl] > min(M_b, M))
            lo += n_b
        keys = jnp.concatenate(keys_l)
        gids = jnp.concatenate(gids_l)
        n_slot_truncated = trunc

    sorted_key, sorted_gidx = lax.sort((keys, gids), num_keys=1)
    sorted_tile = sorted_key // N
    E = keys.shape[0]
    if (T + 1) * E <= 64 * 2**20:
        # per-tile segment boundaries as ONE fused (T+1, E) compare-reduce:
        # cnt[t] = #keys < t·N.  jnp.searchsorted's default scan lowering
        # (log₂E dependent micro-gathers) dominated the round-2 dynamic
        # binning (~0.8 ms/frame); a lane-axis compare+sum never
        # materializes the mask and XLA fuses it to bandwidth speed.
        bnd = jnp.arange(T + 1, dtype=jnp.int32) * N
        cnt = jnp.sum(keys[None, :] < bnd[:, None], axis=1, dtype=jnp.int32)
        starts, ends = cnt[:T], cnt[1:]
    else:
        tids = jnp.arange(T, dtype=jnp.int32)
        starts = jnp.searchsorted(sorted_key, tids * N, side="left",
                                  method="sort")
        ends = jnp.searchsorted(sorted_key, (tids + 1) * N, side="left",
                                method="sort")
    counts = (ends - starts).astype(jnp.int32)
    return sorted_tile, sorted_gidx, starts, counts, n_slot_truncated


def _tile_pixel_centers(tx: int, ty: int, ts: int, dtype=jnp.float32):
    """(T, P, 2) pixel-center coordinates, row-major tiles and pixels."""
    t = jnp.arange(tx * ty, dtype=dtype)
    ox = (t % tx) * ts
    oy = (t // tx) * ts
    p = jnp.arange(ts * ts, dtype=dtype)
    px = ox[:, None] + (p % ts)[None, :] + 0.5
    py = oy[:, None] + (p // ts)[None, :] + 0.5
    return px, py


def composite_tiles(
    gxy: jnp.ndarray,
    gconic: jnp.ndarray,
    gcol: jnp.ndarray,
    gop: jnp.ndarray,
    gdepth: jnp.ndarray,
    tile_ids: jnp.ndarray,
    config: RasterConfig,
    tx: int,
):
    """Chunked front-to-back compositing of per-tile gathered gaussians.

    Args are (T', K, ·) per-tile lists, depth-sorted, with inactive entries
    carrying opacity 0; ``tile_ids`` (T',) are global tile indices (so a
    device owning a tile subset can composite just its rows — the building
    block of the multi-device sharded renderer, parallel/render_sharding.py).

    Returns (rgb (T', P, 3), depth_acc (T', P), trans (T', P)).
    """
    ts = config.tile_size
    K = gxy.shape[1]
    chunk = min(config.chunk, K)
    if K % chunk:
        raise ValueError(f"tile capacity {K} must be a multiple of chunk {chunk}")
    Tloc = gxy.shape[0]
    P = ts * ts

    t = tile_ids.astype(gxy.dtype)
    ox = (t % tx) * ts
    oy = (t // tx) * ts
    p = jnp.arange(P, dtype=gxy.dtype)
    px = ox[:, None] + (p % ts)[None, :] + 0.5             # (T', P)
    py = oy[:, None] + (p // ts)[None, :] + 0.5

    nc = K // chunk
    def to_xs(a):
        return jnp.moveaxis(
            a.reshape((Tloc, nc, chunk) + a.shape[2:]), 1, 0
        )
    xs = tuple(map(to_xs, (gxy, gconic, gcol, gop, gdepth)))

    if config.sigma_cutoff is not None:
        power_min = -0.5 * config.sigma_cutoff**2
    else:
        power_min = None

    @jax.checkpoint
    def body(carry, x):
        rgb, depth_acc, trans = carry
        cxy, cconic, ccol, cop, cdep = x
        dx = px[:, :, None] - cxy[:, None, :, 0]           # (T', P, chunk)
        dy = py[:, :, None] - cxy[:, None, :, 1]
        a = cconic[:, None, :, 0]
        b = cconic[:, None, :, 1]
        c = cconic[:, None, :, 2]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = cop[:, None, :] * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(alpha, ALPHA_CLAMP)
        keep = alpha >= ALPHA_MIN
        if power_min is not None:
            keep &= power >= power_min
        alpha = jnp.where(keep, alpha, 0.0)

        one_minus = 1.0 - alpha
        cp = jnp.cumprod(one_minus, axis=-1)
        excl = jnp.concatenate(
            [jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1
        )
        w = alpha * excl * trans[..., None]                # (T', P, chunk)
        rgb = rgb + jnp.einsum("tpk,tkc->tpc", w, ccol)    # MXU
        depth_acc = depth_acc + jnp.einsum("tpk,tk->tp", w, cdep)
        trans = trans * cp[..., -1]
        return (rgb, depth_acc, trans), None

    # derive the init from the inputs so its device-varying type matches the
    # scan outputs under shard_map (replicated init + varying carry is a
    # type error; see jax shard-map vma docs)
    vary0 = gxy[:, 0, 0] * 0.0                             # (T',) zeros
    init = (
        jnp.zeros((Tloc, P, 3), gxy.dtype) + vary0[:, None, None],
        jnp.zeros((Tloc, P), gxy.dtype) + vary0[:, None],
        jnp.ones((Tloc, P), gxy.dtype) + vary0[:, None],
    )
    (rgb, depth_acc, trans), _ = lax.scan(body, init, xs)
    return rgb, depth_acc, trans


def untile_image(a: jnp.ndarray, tx: int, ty: int, ts: int, H: int, W: int):
    """(T, P, ...) tile-major pixels → (H, W, ...) image."""
    extra = a.shape[2:]
    a = a.reshape((ty, tx, ts, ts) + extra)
    a = jnp.moveaxis(a, 2, 1)
    return a.reshape((ty * ts, tx * ts) + extra)[:H, :W]


def gather_tile_lists(
    proj: Projected,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    config: RasterConfig,
    tx: int,
    ty: int,
):
    """Bin + fixed-capacity per-tile gather.  Returns ((T, K, ·) lists with
    inactive entries zero-opacity, counts, n_slot_truncated)."""
    K = config.tile_capacity
    (sorted_tile, sorted_gidx, starts, counts,
     n_slot_trunc) = _bin_gaussians(proj, config, tx, ty)
    k = jnp.arange(K, dtype=jnp.int32)
    sel = jnp.clip(starts[:, None] + k[None, :], 0, sorted_gidx.shape[0] - 1)
    entry_valid = k[None, :] < jnp.minimum(counts, K)[:, None]
    g = sorted_gidx[sel]                                   # (T, K)

    payload = jnp.concatenate([
        proj.xy,                                           # 0:2
        proj.conic,                                        # 2:5
        colors,                                            # 5:8
        jnp.clip(opacities, 0.0, 1.0)[:, None],            # 8
        proj.depth[:, None],                               # 9
    ], axis=1)
    # the gather's automatic transpose is a (T·K)→(N, 10) scatter-add; on
    # TPU that was measured FASTER than a sort-based custom VJP for this
    # shape (PROFILE.md round-1 table), so the plain gather stays
    lists = payload[g]

    gxy = lists[..., 0:2]
    gconic = lists[..., 2:5]
    gcol = lists[..., 5:8]
    gop = jnp.where(entry_valid, lists[..., 8], 0.0)
    gdepth = lists[..., 9]
    return (gxy, gconic, gcol, gop, gdepth), counts, n_slot_trunc


def composite_dispatch(gxy, gconic, gcol, gop, gdepth, config: RasterConfig,
                       tx: int, counts=None, skip=None):
    """Composite full-grid tile lists via the configured backend.

    ``counts`` (T,) int32 active entries per tile lets the pallas backend
    skip all-padding chunks (lists are actives-first by construction).
    ``skip`` (T,) int32: tiles with skip == 0 are not composited at all
    (their output is the empty composite) — only valid when the caller
    discards those tiles (the cached path's static-composite select).
    Returns (rgb (T, P, 3), depth_acc (T, P), trans (T, P))."""
    T, K = gop.shape
    use_pallas = (
        config.backend in ("pallas", "pallas_interpret")
        and K % 128 == 0
    )
    if not use_pallas:
        tile_ids = jnp.arange(T, dtype=jnp.int32)
        rgb, depth_acc, trans = composite_tiles(
            gxy, gconic, gcol, gop, gdepth, tile_ids, config, tx)
        if skip is not None:   # same output contract as the pallas skip
            m = (skip > 0)
            rgb = jnp.where(m[:, None, None], rgb, 0.0)
            depth_acc = jnp.where(m[:, None], depth_acc, 0.0)
            trans = jnp.where(m[:, None], trans, 1.0)
        return rgb, depth_acc, trans
    from sim_a_splat_tpu.ops.pallas_composite import composite_pallas
    if counts is None:
        counts = jnp.full((T,), K, jnp.int32)
    if skip is None:
        skip = counts
    payload = jnp.concatenate(
        [gxy, gconic, gcol, gdepth[..., None], gop[..., None]], axis=-1)
    payload_t = jnp.swapaxes(payload, 1, 2)                # (T, 10, K)
    out = composite_pallas(payload_t, counts.astype(jnp.int32),
                           skip.astype(jnp.int32),
                           config.tile_size, tx,
                           config.sigma_cutoff,
                           config.backend == "pallas_interpret",
                           config.term_eps)
    return out[..., 0:3], out[..., 3], out[..., 4]


def render_binned(
    proj: Projected,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    camera: Camera,
    config: RasterConfig = RasterConfig(),
    background: jnp.ndarray | None = None,
):
    """Tile-render already-projected gaussians → ((H, W, 3) image, RasterAux)."""
    ts = config.tile_size
    K = config.tile_capacity
    H, W = camera.height, camera.width
    tx = -(-W // ts)
    ty = -(-H // ts)
    T = tx * ty

    (gxy, gconic, gcol, gop, gdepth), counts, n_slot_trunc = gather_tile_lists(
        proj, colors, opacities, config, tx, ty)
    rgb, depth_acc, trans = composite_dispatch(
        gxy, gconic, gcol, gop, gdepth, config, tx, counts=counts)

    if background is None:
        background = jnp.zeros(3, dtype=rgb.dtype)
    rgb = rgb + trans[..., None] * background

    def untile(a):
        return untile_image(a, tx, ty, ts, H, W)

    img = untile(rgb)
    alpha_img = untile(1.0 - trans)
    depth_img = untile(depth_acc) / jnp.maximum(untile(1.0 - trans), 1e-10)

    aux = RasterAux(
        tile_counts=counts,
        n_overflowed_tiles=jnp.sum(counts > K),
        n_slot_truncated=n_slot_trunc,
        alpha=alpha_img,
        depth=depth_img,
    )
    return img, aux


def rasterize(
    means: jnp.ndarray,
    covs: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    camera: Camera,
    config: RasterConfig = RasterConfig(),
    background: jnp.ndarray | None = None,
):
    """Project + tile-render world-space gaussians → ((H, W, 3), RasterAux).

    Drop-in fast equivalent of :func:`render_reference` (same math; tiled).
    """
    proj = project(means, covs, camera)
    return render_binned(proj, colors, opacities, camera, config, background)


def rasterize_sh(
    means: jnp.ndarray,
    covs: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    opacities: jnp.ndarray,
    camera: Camera,
    sh_degree: int,
    config: RasterConfig = RasterConfig(),
    background: jnp.ndarray | None = None,
):
    """Tile rasterization with view-dependent SH colors (degree 0..3)."""
    dirs = view_directions(means, camera)
    colors = sh_ops.eval_sh_color(sh_coeffs, dirs, sh_degree)
    return rasterize(means, covs, colors, opacities, camera, config, background)


def rasterize_raw(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    log_scales: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    camera: Camera,
    config: RasterConfig = RasterConfig(),
    background: jnp.ndarray | None = None,
):
    """Rasterize straight from raw gaussian parameters.

    Same output as ``rasterize(means, compute_cov(quats, exp(log_scales)),
    ...)`` but via the fused :func:`project_raw` — no (N, 3, 3) covariance
    temps, so it is the path for moving (per-env) cameras where posing +
    projection run per frame (the reference's EEF-mounted camera,
    splat_handler.py:316-332)."""
    from sim_a_splat_tpu.ops.projection import project_raw

    proj = project_raw(means, quats, log_scales, camera)
    return render_binned(proj, colors, opacities, camera, config, background)


def rasterize_raw_sh(means, quats, log_scales, sh_coeffs, opacities, camera,
                     sh_degree: int, config: RasterConfig = RasterConfig(),
                     background: jnp.ndarray | None = None):
    """Raw-parameter rasterization with view-dependent SH colors."""
    dirs = view_directions(means, camera)
    colors = sh_ops.eval_sh_color(sh_coeffs, dirs, sh_degree)
    return rasterize_raw(means, quats, log_scales, colors, opacities, camera,
                         config, background)
