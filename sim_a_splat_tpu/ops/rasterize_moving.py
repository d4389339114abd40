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

_SH_C0 = 0.28209479177387814
_SH_C1 = 0.4886025119029199
_SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396)
_SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435)


class MovingCache(NamedTuple):
    """Per-(env, camera-chunk) candidate lists of raw gaussian parameters.

    Channel-major per-field arrays (field axis BEFORE the Kc lane axis):
    one packed (T, R, Kc) payload was measured to OOM the backward —
    every per-row slice's VJP pads back into the full array and XLA
    materialized several such 1.8 GB temps; per-field storage keeps each
    pad at field size, and the SH term contracts via one einsum (one-op
    VJP, no pads at all).
    """

    mean: jnp.ndarray       # (T, 3, Kc) world means
    quat: jnp.ndarray       # (T, 4, Kc) wxyz
    log_scales: jnp.ndarray  # (T, 3, Kc)
    opacity: jnp.ndarray    # (T, Kc) clipped [0, 1], 0 ⇒ inactive
    sh: jnp.ndarray         # (T, K, 3, Kc) SH coefficients
    counts: jnp.ndarray     # (T,) int32 candidates per tile (build time)
    base_q: jnp.ndarray     # (4,) build camera pose
    base_t: jnp.ndarray     # (3,)
    # margin-budget statistics over COUNTED gaussians — everything in
    # front of the near plane except full-grid-cover ones (a gaussian
    # whose dilated bbox covers the whole grid is in every tile's list,
    # so no camera motion can change its membership; near-camera
    # gaussians with 10³-px radii fall in this class, which keeps the
    # budget finite without weakening it).  Each counted gaussian i has a
    # footprint-edge sensitivity P_i = (f + g_i + 2r_i)/z_i px per world
    # unit of camera-frame displacement and an allowance a_i = margin +
    # (entry gap for out-of-view gaussians); the build reduces the
    # per-gaussian inequalities to two scalars (camera_budget_used).
    s_trans: jnp.ndarray    # () max_i P_i / a_i
    s_rot: jnp.ndarray      # () max_i P_i·‖c_i‖ / a_i
    z_min: jnp.ndarray      # () min counted depth (translation correction)
    # behind-plane entry guard: a gaussian with build depth z ≤ the
    # unhandled-behind threshold can surface only after its camera-frame
    # depth rises by (near − z), and Δz_i ≤ ‖δt‖ + 2·sin(θ/2)·‖c_i‖ —
    # reduced to near_gap = min(near − z_i) and g_gap = max ‖c_i‖/(near−z_i)
    # so BOTH translation and rotation are budgeted (a pure wrist rotation
    # can surface behind-camera content too)
    near_gap: jnp.ndarray   # () min(near − z) over unhandled-behind (+inf)
    g_gap: jnp.ndarray      # () max ‖c‖/(near − z) over unhandled-behind
    margin: jnp.ndarray     # () px margin the binning was dilated by
    n_build_truncated: jnp.ndarray  # () tiles cut at kc + slot truncations
    # near/far split (z_split > 0): statics with build depth in
    # (−t_max, z_split) — content at/near the lens, where footprint
    # sensitivities diverge and no margin budget can hold (an EEF-mounted
    # camera has the gripper centimeters away, splat_handler.py:316-332) —
    # are EXCLUDED from the candidate lists and re-binned exactly per
    # frame alongside the dynamics; the unhandled-behind threshold drops
    # to −t_max, so the partition covers every static exactly while the
    # entry guard stays sound.
    near_mean: jnp.ndarray   # (Nn, 3) near-set raw params (pads: op 0)
    near_quat: jnp.ndarray   # (Nn, 4)
    near_ls: jnp.ndarray     # (Nn, 3)
    near_op: jnp.ndarray     # (Nn,)
    near_sh: jnp.ndarray     # (Nn, K, 3)
    z_split: jnp.ndarray     # () the split depth (0 ⇒ split disabled)
    t_max: jnp.ndarray       # () translation budget guarding the split
    n_near_over: jnp.ndarray  # () near-set overflow (severe: unhandled
                              #    near-lens gaussians)


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
    z_split: float = 0.0,
    t_max: float = 0.05,
    near_cap: int = 8,
) -> MovingCache:
    """Dilated-footprint binning + raw-parameter gather for one camera.

    ``build_config`` sizes the dilated binning (``max_tiles_per_gaussian``
    and ``buckets`` must budget for footprints grown by 2·margin px; the
    helper :func:`dilated_build_config` derives one from a render config).
    The gather keeps each tile's nearest-``kc`` candidates by build-time
    depth; overflow is the bounded class, counted in
    ``n_build_truncated``.

    ``z_split`` > 0 enables the near/far split (see MovingCache): statics
    with build depth in (−t_max, z_split) go into a flat ``near_cap``-slot
    set that the renderer re-bins exactly per frame with the dynamics —
    for cameras INSIDE the scene (EEF-mounted), where near-lens content
    makes any margin budget diverge.  ``t_max`` (world units) sets how far
    behind the camera that per-frame-handled slab extends.
    """
    if margin <= 1.0:
        raise ValueError(
            f"build_moving_cache: margin {margin} must exceed 1 px — the "
            "binning radius is ceil'd, so 1 px of the budget is consumed "
            "by quantization jitter (see _margin_stats)")
    ts = build_config.tile_size
    tx = -(-camera.width // ts)
    ty = -(-camera.height // ts)
    proj = project_raw(means, quats, log_scales, camera, dilate=margin)
    near_mask = ((proj.depth < z_split) & (proj.depth > -t_max)
                 if z_split > 0 else jnp.zeros(proj.depth.shape, bool))
    if z_split > 0:
        # near-set gaussians never enter the candidate lists
        proj = proj._replace(valid=proj.valid & ~near_mask,
                             radius=jnp.where(near_mask, 0.0, proj.radius))
    (_, sorted_gidx, starts, counts, n_slot_trunc) = _bin_gaussians(
        proj, build_config, tx, ty)

    n = means.shape[0]
    K = sh_flat.reshape(n, -1).shape[1] // 3
    k = jnp.arange(kc, dtype=jnp.int32)
    sel = jnp.clip(starts[:, None] + k[None, :], 0, sorted_gidx.shape[0] - 1)
    g = sorted_gidx[sel]                                     # (T, Kc)
    payload = jnp.concatenate([
        means,                                               # 0:3
        quats,                                               # 3:7
        log_scales,                                          # 7:10
        jnp.clip(opacities, 0.0, 1.0)[:, None],              # 10
        sh_flat.reshape(n, -1),                              # 11:
    ], axis=1)
    lists = payload[g]                                       # (T, Kc, R)
    entry_valid = k[None, :] < jnp.minimum(counts, kc)[:, None]
    raw = jnp.swapaxes(lists, 1, 2)                          # (T, R, Kc)

    # near set: compact the masked gaussians into near_cap flat slots
    # (split disabled ⇒ keep the mandatory arrays minimal)
    if z_split <= 0:
        near_cap = 8
    near_cap = min(near_cap, n)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    _, near_order = lax.sort(((~near_mask).astype(jnp.int32), iota_n),
                             num_keys=1)
    nsel = near_order[:near_cap]
    nrank = jnp.arange(near_cap, dtype=jnp.int32)
    n_near = jnp.sum(near_mask).astype(jnp.int32)
    near_valid = nrank < n_near
    near_lists = payload[nsel]                               # (Nn, R)
    n_near_over = jnp.maximum(n_near - near_cap, 0)

    s_trans, s_rot, z_min, near_gap, g_gap = _margin_stats(
        means, quats, log_scales, camera, margin, ts, tx, ty,
        z_split=z_split, t_max=t_max)
    return MovingCache(
        mean=raw[:, 0:3], quat=raw[:, 3:7], log_scales=raw[:, 7:10],
        opacity=jnp.where(entry_valid, raw[:, 10], 0.0),
        sh=raw[:, 11:].reshape(raw.shape[0], K, 3, kc),
        counts=jnp.minimum(counts, kc).astype(jnp.int32),
        base_q=camera.pose.q, base_t=camera.pose.t,
        s_trans=s_trans, s_rot=s_rot, z_min=z_min, near_gap=near_gap,
        g_gap=g_gap,
        margin=jnp.asarray(margin, jnp.float32),
        n_build_truncated=(jnp.sum(counts > kc) + n_slot_trunc).astype(
            jnp.int32),
        near_mean=near_lists[:, 0:3], near_quat=near_lists[:, 3:7],
        near_ls=near_lists[:, 7:10],
        near_op=jnp.where(near_valid, near_lists[:, 10], 0.0),
        near_sh=near_lists[:, 11:].reshape(near_cap, K, 3),
        z_split=jnp.asarray(z_split, jnp.float32),
        t_max=jnp.asarray(t_max, jnp.float32),
        n_near_over=n_near_over.astype(jnp.int32))


def _depth_radius(means, quats, log_scales, camera, near=0.01,
                  eps2d=BLUR_2D):
    """(z, r, det) for ALL gaussians — project_raw's depth/radius math
    without the culling zeros (the margin statistics need radii of
    out-of-view gaussians too: they can enter the view)."""
    from sim_a_splat_tpu.ops import quaternion as quat_ops
    from sim_a_splat_tpu.ops.projection import _rotation_rows

    w2c = camera.pose.inverse()
    R = w2c.rotation_matrix()
    p_cam = means @ R.T + w2c.t
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    zc = jnp.maximum(z, near)
    q_cam = quat_ops.multiply(w2c.q, quats)
    r0, r1, r2 = _rotation_rows(q_cam)
    s = jnp.exp(log_scales)
    m0, m1, m2 = r0 * s, r1 * s, r2 * s
    inv_z = 1.0 / zc
    inv_z2 = inv_z * inv_z
    j00 = camera.fx * inv_z
    j02 = -camera.fx * x * inv_z2
    j11 = camera.fy * inv_z
    j12 = -camera.fy * y * inv_z2
    a0 = j00[..., None] * m0 + j02[..., None] * m2
    a1 = j11[..., None] * m1 + j12[..., None] * m2
    a = jnp.sum(a0 * a0, axis=-1) + eps2d
    b = jnp.sum(a0 * a1, axis=-1)
    c = jnp.sum(a1 * a1, axis=-1) + eps2d
    det = a * c - b * b
    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - jnp.maximum(det, 1e-12),
                                     0.01))
    u = camera.fx * x / zc + camera.cx
    v = camera.fy * y / zc + camera.cy
    c_norm = jnp.sqrt(x * x + y * y + z * z)
    return z, jnp.ceil(3.0 * jnp.sqrt(lam)), det, u, v, c_norm


def _margin_stats(means, quats, log_scales, camera, margin, ts, tx, ty,
                  near=0.01, z_split=0.0, t_max=0.05):
    """(s_trans, s_rot, z_min, near_gap, g_gap) over counted gaussians
    (see MovingCache docstring).

    Per counted gaussian i: sensitivity P_i = (f + g_i + 2r_i)/z_i with
    g_i the pixel distance of its mean from the principal point (per-axis
    max) — |Δ(u±r)| ≤ (f + |u−cx| + 2r)·‖Δc‖/z' per axis, the 2r because
    the EWA radius scales ~1/z².  Allowance a_i = margin for candidates
    whose dilated footprint touches the image, margin + entry gap for
    culled out-of-view gaussians (they must first travel the gap before
    any tile membership appears).  The budget reduces to
    s_trans = max P_i/a_i and s_rot = max P_i·‖c_i‖/a_i.
    """
    z, r, det, u, v, c_norm = _depth_radius(means, quats, log_scales,
                                            camera, near)
    rd = r + margin
    full_cover = ((u - rd <= ts) & (u + rd >= (tx - 1) * ts)
                  & (v - rd <= ts) & (v + rd >= (ty - 1) * ts))
    # with the near/far split active, near-set gaussians are re-binned
    # exactly per frame — only far candidates consume margin budget
    counted = (z > max(near, z_split)) & (det > 0.0) & ~full_cover
    f = jnp.maximum(camera.fx, camera.fy)
    gx = jnp.abs(u - camera.cx)
    gy = jnp.abs(v - camera.cy)
    g = jnp.maximum(gx, gy)
    gap_x = jnp.maximum(jnp.maximum(-(u + rd), (u - rd) - camera.width), 0.0)
    gap_y = jnp.maximum(jnp.maximum(-(v + rd), (v - rd) - camera.height),
                        0.0)
    # −1: the binning radius is ceil'd, so footprint edges carry up to 1 px
    # of quantization jitter on top of the smooth bound (pinned by the
    # brute-force conservativeness test); margin must exceed 1
    a = (margin - 1.0) + jnp.maximum(gap_x, gap_y)
    zc = jnp.maximum(z, near)
    P = jnp.where(counted, (f + g + 2.0 * r) / zc, 0.0)
    s_trans = jnp.max(P / a)
    s_rot = jnp.max(P * c_norm / a)
    z_min = jnp.min(jnp.where(counted, z, jnp.inf))
    # unhandled-behind set: with the near/far split, z ∈ (−t_max, z_split)
    # is re-binned per frame, so only z ≤ −t_max can surface unseen
    behind = z <= (near if z_split <= 0 else -t_max)
    gap = near - z
    near_gap = jnp.min(jnp.where(behind, gap, jnp.inf))
    g_gap = jnp.max(jnp.where(behind, c_norm / gap, 0.0))
    return s_trans, s_rot, z_min, near_gap, g_gap


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


def camera_budget_used(cache: MovingCache, camera: Camera) -> jnp.ndarray:
    """Fraction of the candidate-cache margin budget this camera consumes.

    For a world point p with build-camera coords c (depth z) and a camera
    moved by (δR, δt):  c' = δR·c − R_newᵀδt, so ‖c' − c‖ ≤ ‖δt‖ +
    2·sin(θ/2)·‖c‖.  Each counted gaussian's footprint-edge shift then
    obeys  shift_i ≤ P_i·corr·(‖δt‖ + 2·sin(θ/2)·(‖c_i‖ + ‖δt‖))  with
    corr = z_min/(z_min − ‖δt‖) absorbing z' ≥ z − ‖δt‖; the candidate
    lists remain supersets while shift_i ≤ a_i for every i
    (see :func:`_margin_stats`), i.e. while this function's value stays
    ≤ 1.  Behind-near-plane entry (camera retreat ≥ ``near_gap``) and
    dt ≥ z_min return +inf.  Conservatism is pinned against brute-force
    reprojection in tests/test_rasterize_moving.py.
    """
    dq = jnp.abs(jnp.sum(cache.base_q * camera.pose.q))
    theta = 2.0 * jnp.arccos(jnp.clip(dq, 0.0, 1.0))
    dt = jnp.linalg.norm(camera.pose.t - cache.base_t)
    sin_h = jnp.sin(jnp.minimum(theta / 2.0, jnp.pi / 2.0))
    # far-candidate budget; a cache with NO counted gaussians (z_min = inf,
    # e.g. everything near/full-cover/behind) has nothing to protect — the
    # naive corr would be inf/inf = NaN and silently disable every guard
    corr = jnp.where(dt < cache.z_min,
                     cache.z_min / jnp.maximum(cache.z_min - dt, 1e-12),
                     jnp.inf)
    used_far = jnp.where(
        jnp.isfinite(cache.z_min),
        corr * (dt * cache.s_trans
                + 2.0 * sin_h * (cache.s_rot + dt * cache.s_trans)),
        0.0)
    # behind-plane entry: a gaussian at build depth z surfaces only after
    # its camera-frame depth rises by (near − z), and Δz ≤ ‖δt‖ +
    # 2·sin(θ/2)·‖c‖ — so ROTATION is budgeted too (a pure wrist rotation
    # can surface behind-camera content)
    used_gap = dt / cache.near_gap + 2.0 * sin_h * cache.g_gap
    return jnp.maximum(used_far, used_gap)


def _sh_basis(dx, dy, dz, sh_degree: int) -> jnp.ndarray:
    """(T, K, Kc) stacked real-SH basis from (T, Kc) direction components
    — same polynomials as ops/sh.py::eval_sh."""
    b = [jnp.full_like(dx, _SH_C0)]
    if sh_degree >= 1:
        b += [-_SH_C1 * dy, _SH_C1 * dz, -_SH_C1 * dx]
    if sh_degree >= 2:
        xx, yy, zz = dx * dx, dy * dy, dz * dz
        xy, yz, xz = dx * dy, dy * dz, dx * dz
        b += [_SH_C2[0] * xy, _SH_C2[1] * yz,
              _SH_C2[2] * (2.0 * zz - xx - yy), _SH_C2[3] * xz,
              _SH_C2[4] * (xx - yy)]
    if sh_degree >= 3:
        b += [_SH_C3[0] * dy * (3.0 * xx - yy), _SH_C3[1] * xy * dz,
              _SH_C3[2] * dy * (4.0 * zz - xx - yy),
              _SH_C3[3] * dz * (2.0 * zz - 3.0 * xx - 3.0 * yy),
              _SH_C3[4] * dx * (4.0 * zz - xx - yy),
              _SH_C3[5] * dz * (xx - yy),
              _SH_C3[6] * dx * (xx - 3.0 * yy)]
    return jnp.stack(b, axis=1)


def reproject_candidates(
    cache: MovingCache,
    camera: Camera,
    sh_degree: int,
    config: RasterConfig,
    near: float = 0.01,
    eps2d: float = BLUR_2D,
    sort: bool = True,
):
    """Project the cached candidates under the CURRENT camera.

    All math runs on (T, Kc) channel-major slices of the cached payload —
    one fused elementwise pass over the cache, no (N, small) arrays.  The
    formulas are exactly ``project_raw``'s (same radius/validity rules,
    ``dilate=0``) plus the exact per-frame SH evaluation, so the produced
    per-tile lists match a fresh ``gather_tile_lists`` of the same tile up
    to fp reassociation and capacity truncation.

    With ``sort=True`` returns (spay (T, 10, Kc) depth-sorted kernel
    payload, counts (T,)); with ``sort=False`` returns the raw
    (payload (T, Kc, 10), key (T, Kc)) for the caller to merge with
    per-frame dynamics before one joint sort (render_moving_batch).
    """
    T, _, Kc = cache.mean.shape
    ts = config.tile_size
    tx = -(-camera.width // ts)

    mx = cache.mean[:, 0]
    my = cache.mean[:, 1]
    mz = cache.mean[:, 2]

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
    rw = cache.quat[:, 0]
    rx = cache.quat[:, 1]
    ry = cache.quat[:, 2]
    rz = cache.quat[:, 3]
    qw = pw * rw - px_ * rx - py_ * ry - pz_ * rz
    qx = pw * rx + px_ * rw + py_ * rz - pz_ * ry
    qy = pw * ry - px_ * rz + py_ * rw + pz_ * rx
    qz = pw * rz + px_ * ry - py_ * rx + pz_ * rw
    qn = jnp.maximum(jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz), 1e-12)
    qw, qx, qy, qz = qw / qn, qx / qn, qy / qn, qz / qn
    s0 = jnp.exp(cache.log_scales[:, 0])
    s1 = jnp.exp(cache.log_scales[:, 1])
    s2 = jnp.exp(cache.log_scales[:, 2])
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

    # exact per-frame SH for the current view directions: one stacked
    # basis + one einsum over the coefficient axis (single-op VJP)
    dxw = mx - camera.pose.t[0]
    dyw = my - camera.pose.t[1]
    dzw = mz - camera.pose.t[2]
    dn = jnp.maximum(jnp.sqrt(dxw * dxw + dyw * dyw + dzw * dzw), 1e-12)
    K = (sh_degree + 1) ** 2
    basis = _sh_basis(dxw / dn, dyw / dn, dzw / dn, sh_degree)  # (T, K, Kc)
    cols = jnp.maximum(
        jnp.einsum("tkx,tkcx->tcx", basis, cache.sh[:, :K]) + 0.5, 0.0)
    cr, cg, cbl = cols[:, 0], cols[:, 1], cols[:, 2]

    # current-footprint tile test: a candidate whose 3σ bbox misses its
    # tile contributes exactly 0 under sigma_cutoff ≥ 3 — compact it away
    # so the kernel walks only what a fresh rebin would walk
    tix = jnp.arange(T, dtype=jnp.float32)
    ox = (tix % tx)[:, None] * ts
    oy = (tix // tx)[:, None] * ts
    touches = ((u + radius > ox) & (u - radius < ox + ts)
               & (v + radius > oy) & (v - radius < oy + ts))
    op_eff = jnp.where((z > near) & (det > 0.0) & touches,
                       cache.opacity, 0.0)

    # the key only ORDERS entries (grads reach depth through the payload's
    # own z row); without stop_gradient jax builds the full sort-VJP
    # machinery over the (T, Kc) width — measured as a 27 GB HBM backward
    key = lax.stop_gradient(jnp.where(op_eff > 0.0, z, jnp.inf))
    payload = jnp.stack([u, v, ca, cb, cc, cr, cg, cbl, z, op_eff], axis=-1)
    if not sort:
        return payload, key
    spay = jnp.swapaxes(_sort_by_key(payload, key), 1, 2)    # (T, 10, Kc)
    counts = jnp.sum(op_eff > 0.0, axis=1).astype(jnp.int32)
    return spay, counts


def _sort_by_key(payload: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
    """Sort (T, K, C) payload rows by (T, K) keys via the gather-free
    permute (two int sorts + one sort-apply, custom VJP)."""
    K = key.shape[1]
    iota = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), key.shape)
    _, order = lax.sort((key, iota), dimension=1, num_keys=1)
    _, dest = lax.sort((order, iota), dimension=1, num_keys=1)
    return _permute_rows(payload, dest)


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
    step; Nd is small) and MERGED into the candidate lists by the same
    per-tile depth sort that re-orders the reprojected statics, so the
    composite is ONE single-list kernel launch (``composite_sel_single``)
    with no dynamic-interleave state: no (P, Kd) MXU dots per chunk and —
    critically — no (B, T, P, Kd) ltsd residual, which lets an R-frame
    rollout scan keep the kernel's saved residuals (payload + output)
    instead of rematerializing the whole forward per frame.  The
    elementwise candidate reprojection IS rematerialized (cheap, one
    ``jax.checkpoint``) so its wide intermediates never persist.
    Returns ((B, 3, H, W) CHW images, RasterAux) — same conventions as
    :func:`rasterize_cache_sel_batch`.
    """
    from sim_a_splat_tpu.ops.pallas_composite import CHUNK
    from sim_a_splat_tpu.ops.pallas_composite_sel import composite_sel_single

    ts = config.tile_size
    B, T, _, Kc = caches.mean.shape
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

    # remat only the wide elementwise reprojection: its recompute is one
    # fused pass over the cache, while saving its ~20 (T, Kc)-sized
    # intermediates per frame would dominate the rollout's memory
    reproject = jax.checkpoint(
        lambda cache, cam: reproject_candidates(cache, cam, sh_degree,
                                                config, sort=False))

    def one_env(cache, cam, dm, dq, dls, dc, dop):
        pay_s, key_s = reproject(cache, cam)                 # (T, Kc, 10)
        # near-set statics (z_split > 0): re-binned exactly per frame with
        # the dynamics — cameras inside the scene keep their near-lens
        # content out of the margin-budgeted candidate lists
        from sim_a_splat_tpu.ops import sh as _sh
        from sim_a_splat_tpu.ops.projection import view_directions
        ncols = _sh.eval_sh_color(
            cache.near_sh, view_directions(cache.near_mean, cam), sh_degree)
        nd = dm.shape[0]
        dm = jnp.concatenate([dm, cache.near_mean])
        dq = jnp.concatenate([dq, cache.near_quat])
        dls = jnp.concatenate([dls, cache.near_ls])
        dc = jnp.concatenate([dc, ncols])
        dop = jnp.concatenate([dop, cache.near_op])
        proj = project_raw(dm, dq, dls, cam)
        # near-set PAD slots carry arbitrary copied geometry with only
        # opacity zeroed — cull them from binning outright, or they
        # occupy per-tile capacity slots and displace real dynamics
        live = jnp.concatenate(
            [jnp.ones((nd,), bool), cache.near_op > 0.0])
        proj = proj._replace(valid=proj.valid & live,
                             radius=jnp.where(live, proj.radius, 0.0))
        (gxy, gconic, gcol, gop, gdepth), dcounts, dtrunc = gather_tile_lists(
            proj, dc, dop, dyn_cfg, tx, ty)
        pay_d = jnp.concatenate(
            [gxy, gconic, gcol, gdepth[..., None], gop[..., None]],
            axis=-1)                                         # (T, Kd, 10)
        key_d = lax.stop_gradient(
            jnp.where(gop > 0.0, gdepth, jnp.inf))
        pay = jnp.concatenate([pay_s, pay_d], axis=1)
        key = jnp.concatenate([key_s, key_d], axis=1)
        spay = jnp.swapaxes(_sort_by_key(pay, key), 1, 2)    # (T, 10, Km)
        counts = jnp.sum(key < jnp.inf, axis=1).astype(jnp.int32)
        return spay, counts, dcounts, dtrunc

    spay, counts, dcounts, dtrunc = jax.vmap(one_env)(
        caches, cameras, dyn_means, dyn_quats, dyn_log_scales, dyn_colors,
        dyn_opacities)

    Km = Kc + dyn_capacity
    spay_pad = jnp.concatenate(
        [spay, jnp.zeros((B, 1, 10, Km), spay.dtype)], axis=1)
    counts_pad = jnp.concatenate(
        [counts, jnp.zeros((B, 1), jnp.int32)], axis=1)
    ids = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    interpret = config.backend == "pallas_interpret"
    out = composite_sel_single(spay_pad, ids, counts_pad, ts, tx,
                               config.sigma_cutoff, interpret,
                               config.term_eps)              # (B, T+1, 8, P)
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
        tile_counts=counts,
        n_overflowed_tiles=jnp.sum(dcounts > dyn_capacity),
        n_slot_truncated=jnp.sum(dtrunc),
        alpha=alpha,
        depth=depth,
    )
    return imgs, aux
