"""Frame-coherent moving-camera rasterization: the candidate tile cache.

The reference's real hot loop renders an EEF-mounted (moving) camera every
control step (examples/demo_pusht_splat.py:67-78, camera pose from
splat_handler.py:316-332, render loop splat_env_wrapper.py:140-159).  A
moving camera invalidates the fixed-camera static tile cache, and the
naive TPU path re-projects AND re-bins all N gaussians per env per frame.
Round-5 profiling (benchmarks/profile_moving.py, B=16, N=100k, 256²):

    per-env SH + projection of all N    5.2 ms/batch   (cheap)
    per-env binning sort                203.7 ms/batch (dominant)
    per-env (T, K) payload row gather   75.5 ms/batch  (2nd)
    dense composite fwd+bwd             50.7 ms/batch

The binning STRUCTURE is the cost, not the math — and the structure is
frame-coherent: the camera moves millimeters per control step.  So:

- ``build_moving_cache`` bins ONCE with a ``margin``-dilated footprint
  (``project_raw(..., dilate=margin)``) and gathers each tile's nearest
  ``kc`` candidates' RAW parameters (means/quats/log-scales/opacity/SH)
  into a channel-major (T, R, Kc) payload.
- ``reproject_candidates`` re-projects the cached candidates under the
  CURRENT camera each frame with pure (T, Kc)-sliced elementwise math (no
  N-array, no sort over N·M emissions, no row gather), evaluates SH
  exactly for the current view directions, compacts away candidates whose
  current footprint misses their tile (their contribution is exactly 0
  under ``sigma_cutoff``, so dropping them is exact — and it keeps the
  compositing walk as short as a fresh rebin's), and re-sorts each tile by
  current depth (``_permute_rows`` — sort-apply with a gather-free VJP).
- ``render_moving_batch`` composites all tiles with the selected-tile
  pallas kernel in per-env-static mode (ops/pallas_composite_sel.py) —
  channel-major output, pass-A-free backward, and a dyn-free chunk
  specialization for the ~90 % of tiles without dynamic gaussians —
  merging per-frame-binned dynamics by depth on the fly.

Exactness contract: while the camera stays within the margin budget
(``camera_shift_bound`` ≤ margin — a conservative analytic bound from the
camera delta), every gaussian whose footprint can touch a tile is in that
tile's candidate list, and the rendered image equals the full-rebin render
up to (a) fp reassociation of the identical projection formulas and (b)
the shared bounded nearest-K capacity-truncation class (counted in
``MovingCache.n_build_truncated`` / RasterAux, same accounting as the
fixed-camera path).  Callers must rebuild the cache (or count a violation)
when the bound is exceeded — the env wrapper and the bench surface this as
the severe class next to ``sel_dropped``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from sim_a_splat_tpu.ops.projection import BLUR_2D, Camera, project_raw
from sim_a_splat_tpu.ops.rasterize_cached import (
    _pack_payload, _permute_rows,
)
from sim_a_splat_tpu.ops.rasterize_tiles import (
    RasterAux, RasterConfig, _bin_gaussians, gather_tile_lists, untile_image,
)

# candidate payload row layout (build-time raw parameters, field-major)
_RM_MEAN = 0          # rows 0:3   world mean xyz
_RM_QUAT = 3          # rows 3:7   wxyz quaternion
_RM_LS = 7            # rows 7:10  log scales
_RM_OP = 10           # row  10    opacity (clipped [0, 1], 0 ⇒ inactive)
_RM_SH = 11           # rows 11:11+3K  SH coefficients, k-major [k·3 + c]

_SH_C0 = 0.28209479177387814
_SH_C1 = 0.4886025119029199
_SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396)
_SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435)


class MovingCache(NamedTuple):
    """Per-(env, camera-chunk) candidate lists of raw gaussian parameters."""

    raw: jnp.ndarray        # (T, R, Kc) candidate payload (rows above)
    counts: jnp.ndarray     # (T,) int32 candidates per tile (build time)
    base_q: jnp.ndarray     # (4,) build camera pose
    base_t: jnp.ndarray     # (3,)
    z_min: jnp.ndarray      # () min valid candidate depth at build
    r_max: jnp.ndarray      # () max undilated screen radius at build
    margin: jnp.ndarray     # () px margin the binning was dilated by
    n_build_truncated: jnp.ndarray  # () tiles cut at kc + slot truncations


def num_sh_rows(sh_degree: int) -> int:
    return 11 + 3 * (sh_degree + 1) ** 2


def build_moving_cache(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    log_scales: jnp.ndarray,
    sh_flat: jnp.ndarray,       # (N, 3K) k-major flattened SH coefficients
    opacities: jnp.ndarray,
    camera: Camera,
    build_config: RasterConfig,
    kc: int = 1024,
    margin: float = 16.0,
) -> MovingCache:
    """Dilated-footprint binning + raw-parameter gather for one camera.

    ``build_config`` sizes the dilated binning (``max_tiles_per_gaussian``
    and ``buckets`` must budget for footprints grown by 2·margin px; the
    helper :func:`dilated_build_config` derives one from a render config).
    The gather keeps each tile's nearest-``kc`` candidates by build-time
    depth; overflow is the bounded class, counted in
    ``n_build_truncated``.
    """
    ts = build_config.tile_size
    tx = -(-camera.width // ts)
    ty = -(-camera.height // ts)
    proj = project_raw(means, quats, log_scales, camera, dilate=margin)
    (_, sorted_gidx, starts, counts, n_slot_trunc) = _bin_gaussians(
        proj, build_config, tx, ty)

    k = jnp.arange(kc, dtype=jnp.int32)
    sel = jnp.clip(starts[:, None] + k[None, :], 0, sorted_gidx.shape[0] - 1)
    g = sorted_gidx[sel]                                     # (T, Kc)
    payload = jnp.concatenate([
        means,                                               # 0:3
        quats,                                               # 3:7
        log_scales,                                          # 7:10
        jnp.clip(opacities, 0.0, 1.0)[:, None],              # 10
        sh_flat.reshape(means.shape[0], -1),                 # 11:
    ], axis=1)
    lists = payload[g]                                       # (T, Kc, R)
    entry_valid = k[None, :] < jnp.minimum(counts, kc)[:, None]
    lists = lists.at[..., _RM_OP].set(
        jnp.where(entry_valid, lists[..., _RM_OP], 0.0))
    raw = jnp.swapaxes(lists, 1, 2)                          # (T, R, Kc)

    z_min = jnp.min(jnp.where(proj.valid, proj.depth, jnp.inf))
    r_max = jnp.maximum(
        jnp.max(jnp.where(proj.valid, proj.radius, 0.0)) - margin, 0.0)
    return MovingCache(
        raw=raw, counts=jnp.minimum(counts, kc).astype(jnp.int32),
        base_q=camera.pose.q, base_t=camera.pose.t,
        z_min=z_min, r_max=r_max,
        margin=jnp.asarray(margin, jnp.float32),
        n_build_truncated=(jnp.sum(counts > kc) + n_slot_trunc).astype(
            jnp.int32))


def dilated_build_config(config: RasterConfig, margin: float) -> RasterConfig:
    """Derive a binning config whose slot budget covers ``margin``-dilated
    footprints: every bucket's M grows by the dilation's worst-case extra
    tile span (2·margin px → ⌈2·margin/ts⌉ + 1 tiles per axis)."""
    ts = config.tile_size
    extra = -(-int(2 * margin) // ts) + 1
    if config.buckets:
        buckets = tuple(
            ((int(round(m ** 0.5)) + extra) ** 2, f)
            for m, f in config.buckets)
        m_max = max(m for m, _ in buckets)
    else:
        side = int(round(config.max_tiles_per_gaussian ** 0.5))
        m_max = (side + extra) ** 2
        buckets = None
    return config._replace(max_tiles_per_gaussian=m_max, buckets=buckets)


def camera_shift_bound(cache: MovingCache, camera: Camera) -> jnp.ndarray:
    """Conservative screen-space shift (px) of any candidate footprint
    between the cache's build camera and ``camera``.

    For a world point p with build-camera coords c (depth z ≥ z_min) and a
    camera moved by (δR, δt):  c' = δR·(c − R·δt), so ‖c' − c‖ ≤ ‖δt‖ +
    2·sin(θ/2)·(‖c‖ + ‖δt‖) with ‖c‖ ≤ κ·z, κ = sec of the padded
    half-diagonal FOV.  The pixel shift of u = fx·x/z obeys |u' − u| ≤
    (fx + |u − cx|)·‖c' − c‖ / z', and footprint growth is folded in by
    the 2·r_max term.  Exceeding ``cache.margin`` means the candidate
    lists may no longer be supersets — rebuild (or count a violation).
    """
    dq = jnp.abs(jnp.sum(cache.base_q * camera.pose.q))
    theta = 2.0 * jnp.arccos(jnp.clip(dq, 0.0, 1.0))
    dt = jnp.linalg.norm(camera.pose.t - cache.base_t)
    z_eff = jnp.maximum(cache.z_min - dt, 1e-3)
    f = jnp.maximum(camera.fx, camera.fy)
    m = cache.margin
    kappa = jnp.sqrt(
        1.0
        + ((camera.width / 2 + m) / camera.fx) ** 2
        + ((camera.height / 2 + m) / camera.fy) ** 2)
    umax = max(camera.width, camera.height) / 2 + m
    rel = dt / z_eff
    return ((f + umax + 2.0 * cache.r_max)
            * (rel + 2.0 * jnp.sin(theta / 2.0) * kappa * (1.0 + rel)))


def _eval_sh_rows(raw, dx, dy, dz, sh_degree: int):
    """SH color from cached coefficient rows with (T, Kc) direction
    components — same math as ops/sh.py::eval_sh_color, channel-major."""
    def co(k, c):
        return raw[:, _RM_SH + 3 * k + c]

    cols = []
    for c in range(3):
        r = _SH_C0 * co(0, c)
        if sh_degree >= 1:
            r = (r - _SH_C1 * dy * co(1, c) + _SH_C1 * dz * co(2, c)
                 - _SH_C1 * dx * co(3, c))
        if sh_degree >= 2:
            xx, yy, zz = dx * dx, dy * dy, dz * dz
            xy, yz, xz = dx * dy, dy * dz, dx * dz
            r = (r + _SH_C2[0] * xy * co(4, c) + _SH_C2[1] * yz * co(5, c)
                 + _SH_C2[2] * (2.0 * zz - xx - yy) * co(6, c)
                 + _SH_C2[3] * xz * co(7, c)
                 + _SH_C2[4] * (xx - yy) * co(8, c))
        if sh_degree >= 3:
            r = (r + _SH_C3[0] * dy * (3.0 * xx - yy) * co(9, c)
                 + _SH_C3[1] * xy * dz * co(10, c)
                 + _SH_C3[2] * dy * (4.0 * zz - xx - yy) * co(11, c)
                 + _SH_C3[3] * dz * (2.0 * zz - 3.0 * xx - 3.0 * yy)
                 * co(12, c)
                 + _SH_C3[4] * dx * (4.0 * zz - xx - yy) * co(13, c)
                 + _SH_C3[5] * dz * (xx - yy) * co(14, c)
                 + _SH_C3[6] * dx * (dx * dx - 3.0 * yy) * co(15, c))
        cols.append(jnp.maximum(r + 0.5, 0.0))
    return cols


def reproject_candidates(
    cache: MovingCache,
    camera: Camera,
    sh_degree: int,
    config: RasterConfig,
    near: float = 0.01,
    eps2d: float = BLUR_2D,
):
    """Project the cached candidates under the CURRENT camera.

    All math runs on (T, Kc) channel-major slices of the cached payload —
    one fused elementwise pass over the cache, no (N, small) arrays.  The
    formulas are exactly ``project_raw``'s (same radius/validity rules,
    ``dilate=0``) plus the exact per-frame SH evaluation, so the produced
    per-tile lists match a fresh ``gather_tile_lists`` of the same tile up
    to fp reassociation and capacity truncation.

    Returns (spay (T, 10, Kc) depth-sorted kernel payload, counts (T,)).
    """
    raw = cache.raw
    T, _, Kc = raw.shape
    ts = config.tile_size
    tx = -(-camera.width // ts)

    mx = raw[:, _RM_MEAN + 0]
    my = raw[:, _RM_MEAN + 1]
    mz = raw[:, _RM_MEAN + 2]

    w2c = camera.pose.inverse()
    R = w2c.rotation_matrix()
    x = R[0, 0] * mx + R[0, 1] * my + R[0, 2] * mz + w2c.t[0]
    y = R[1, 0] * mx + R[1, 1] * my + R[1, 2] * mz + w2c.t[1]
    z = R[2, 0] * mx + R[2, 1] * my + R[2, 2] * mz + w2c.t[2]
    zc = jnp.maximum(z, near)
    u = camera.fx * x / zc + camera.cx
    v = camera.fy * y / zc + camera.cy

    # q_cam = w2c.q ⊗ q, Hamilton, then rotation rows of the normalized
    # product scaled by exp(log_scales): M = R_cam·S row by row
    pw, px_, py_, pz_ = w2c.q[0], w2c.q[1], w2c.q[2], w2c.q[3]
    rw = raw[:, _RM_QUAT + 0]
    rx = raw[:, _RM_QUAT + 1]
    ry = raw[:, _RM_QUAT + 2]
    rz = raw[:, _RM_QUAT + 3]
    qw = pw * rw - px_ * rx - py_ * ry - pz_ * rz
    qx = pw * rx + px_ * rw + py_ * rz - pz_ * ry
    qy = pw * ry - px_ * rz + py_ * rw + pz_ * rx
    qz = pw * rz + px_ * ry - py_ * rx + pz_ * rw
    qn = jnp.maximum(jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz), 1e-12)
    qw, qx, qy, qz = qw / qn, qx / qn, qy / qn, qz / qn
    s0 = jnp.exp(raw[:, _RM_LS + 0])
    s1 = jnp.exp(raw[:, _RM_LS + 1])
    s2 = jnp.exp(raw[:, _RM_LS + 2])
    m00 = (1 - 2 * (qy * qy + qz * qz)) * s0
    m01 = (2 * (qx * qy - qw * qz)) * s1
    m02 = (2 * (qx * qz + qw * qy)) * s2
    m10 = (2 * (qx * qy + qw * qz)) * s0
    m11 = (1 - 2 * (qx * qx + qz * qz)) * s1
    m12 = (2 * (qy * qz - qw * qx)) * s2
    m20 = (2 * (qx * qz - qw * qy)) * s0
    m21 = (2 * (qy * qz + qw * qx)) * s1
    m22 = (1 - 2 * (qx * qx + qy * qy)) * s2

    inv_z = 1.0 / zc
    inv_z2 = inv_z * inv_z
    j00 = camera.fx * inv_z
    j02 = -camera.fx * x * inv_z2
    j11 = camera.fy * inv_z
    j12 = -camera.fy * y * inv_z2
    a00 = j00 * m00 + j02 * m20
    a01 = j00 * m01 + j02 * m21
    a02 = j00 * m02 + j02 * m22
    a10 = j11 * m10 + j12 * m20
    a11 = j11 * m11 + j12 * m21
    a12 = j11 * m12 + j12 * m22
    a = a00 * a00 + a01 * a01 + a02 * a02 + eps2d
    b = a00 * a10 + a01 * a11 + a02 * a12
    c = a10 * a10 + a11 * a11 + a12 * a12 + eps2d
    det = a * c - b * b
    det_safe = jnp.maximum(det, 1e-12)
    inv_det = 1.0 / det_safe
    ca, cb, cc = c * inv_det, -b * inv_det, a * inv_det
    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det_safe, 0.01))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    # exact per-frame SH for the current view directions
    dxw = mx - camera.pose.t[0]
    dyw = my - camera.pose.t[1]
    dzw = mz - camera.pose.t[2]
    dn = jnp.maximum(jnp.sqrt(dxw * dxw + dyw * dyw + dzw * dzw), 1e-12)
    cr, cg, cbl = _eval_sh_rows(raw, dxw / dn, dyw / dn, dzw / dn, sh_degree)

    # current-footprint tile test: a candidate whose 3σ bbox misses its
    # tile contributes exactly 0 under sigma_cutoff ≥ 3 — compact it away
    # so the kernel walks only what a fresh rebin would walk
    tix = jnp.arange(T, dtype=jnp.float32)
    ox = (tix % tx)[:, None] * ts
    oy = (tix // tx)[:, None] * ts
    touches = ((u + radius > ox) & (u - radius < ox + ts)
               & (v + radius > oy) & (v - radius < oy + ts))
    op = raw[:, _RM_OP]
    op_eff = jnp.where((z > near) & (det > 0.0) & touches, op, 0.0)

    key = jnp.where(op_eff > 0.0, z, jnp.inf)
    iota = jnp.broadcast_to(jnp.arange(Kc, dtype=jnp.int32), key.shape)
    _, order = lax.sort((key, iota), dimension=1, num_keys=1)
    _, dest = lax.sort((order, iota), dimension=1, num_keys=1)
    payload = jnp.stack([u, v, ca, cb, cc, cr, cg, cbl, z, op_eff], axis=-1)
    spay = jnp.swapaxes(_permute_rows(payload, dest), 1, 2)  # (T, 10, Kc)
    counts = jnp.sum(op_eff > 0.0, axis=1).astype(jnp.int32)
    return spay, counts


def render_moving_batch(
    caches: MovingCache,         # batched: (B, T, R, Kc) leaves
    cameras: Camera,             # batched pose/intrinsics leaves (B, …)
    dyn_means: jnp.ndarray,      # (B, Nd, 3)
    dyn_quats: jnp.ndarray,
    dyn_log_scales: jnp.ndarray,
    dyn_colors: jnp.ndarray,     # (B, Nd, 3) — already SH-evaluated
    dyn_opacities: jnp.ndarray,  # (B, Nd)
    config: RasterConfig,
    sh_degree: int,
    dyn_capacity: int = 128,
    dyn_max_tiles: int | None = None,
    background: jnp.ndarray | None = None,
):
    """One batched moving-camera render against per-env candidate caches.

    Dynamics are exactly re-binned per env per frame (they move every
    step; Nd is small), statics come from ``reproject_candidates``, and
    one per-env-static selected-tile kernel launch composites all tiles.
    Returns ((B, 3, H, W) CHW images, RasterAux) — same conventions as
    :func:`rasterize_cache_sel_batch`.
    """
    from sim_a_splat_tpu.ops.pallas_composite import CHUNK
    from sim_a_splat_tpu.ops.pallas_composite_sel import composite_pair_sel
    from sim_a_splat_tpu.ops.rasterize_cached import TileCache

    ts = config.tile_size
    B, T, _, Kc = caches.raw.shape
    H = cameras.height
    W = cameras.width
    tx = -(-W // ts)
    ty = -(-H // ts)
    if Kc % CHUNK != 0 or dyn_capacity % CHUNK != 0:
        raise ValueError(
            f"render_moving_batch: kc {Kc} and dyn_capacity {dyn_capacity} "
            f"must be multiples of the kernel chunk {CHUNK}")
    if config.backend not in ("pallas", "pallas_interpret"):
        raise ValueError("render_moving_batch requires a pallas backend")
    if config.sigma_cutoff is None or config.sigma_cutoff > 3.0:
        raise ValueError(
            "render_moving_batch requires sigma_cutoff ≤ 3: candidate "
            "compaction drops entries whose 3σ bbox misses the tile, which "
            "is exact only when the kernel cuts at ≤ 3σ")

    dyn_cfg = config._replace(tile_capacity=dyn_capacity)
    if dyn_max_tiles is not None:
        dyn_cfg = dyn_cfg._replace(max_tiles_per_gaussian=dyn_max_tiles)

    def one_env(cache, cam, dm, dq, dls, dc, dop):
        spay, counts_s = reproject_candidates(cache, cam, sh_degree, config)
        proj = project_raw(dm, dq, dls, cam)
        (gxy, gconic, gcol, gop, gdepth), dcounts, dtrunc = gather_tile_lists(
            proj, dc, dop, dyn_cfg, tx, ty)
        dpay = _pack_payload(TileCache(gxy, gconic, gcol, gop, gdepth,
                                       dcounts))
        return spay, counts_s, dpay, dcounts, dtrunc

    spay, counts_s, dpay, dcounts, dtrunc = jax.vmap(one_env)(
        caches, cameras, dyn_means, dyn_quats, dyn_log_scales, dyn_colors,
        dyn_opacities)

    spay_pad = jnp.concatenate(
        [spay, jnp.zeros((B, 1, 10, Kc), spay.dtype)], axis=1)
    counts_s_pad = jnp.concatenate(
        [counts_s, jnp.zeros((B, 1), jnp.int32)], axis=1)
    ids = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    counts_d = jnp.minimum(dcounts, dyn_capacity).astype(jnp.int32)

    interpret = config.backend == "pallas_interpret"
    out = composite_pair_sel(spay_pad, dpay, ids, counts_s_pad, counts_d,
                             ts, tx, config.sigma_cutoff, interpret,
                             config.term_eps, config.sel_exact_fwd,
                             config.sel_exact_bwd)             # (B, T+1, 8, P)
    sel8 = out[:, :T]

    if background is None:
        background = jnp.zeros(3, dtype=sel8.dtype)

    def untile(a):
        return untile_image(a, tx, ty, ts, H, W)

    untile_b = jax.vmap(untile)
    trans = sel8[:, :, 4, :]
    imgs = jnp.stack(
        [untile_b(sel8[:, :, ch, :] + trans * background[ch])
         for ch in range(3)], axis=1)                          # (B, 3, H, W)
    alpha = untile_b(1.0 - trans)
    depth = untile_b(sel8[:, :, 3, :]) / jnp.maximum(alpha, 1e-10)
    aux = RasterAux(
        tile_counts=counts_s + counts_d,
        n_overflowed_tiles=jnp.sum(dcounts > dyn_capacity),
        n_slot_truncated=jnp.sum(dtrunc),
        alpha=alpha,
        depth=depth,
    )
    return imgs, aux
