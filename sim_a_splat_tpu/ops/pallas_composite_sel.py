"""Touched-tile-compacted fused compositing — the batched production path.

The fused pair kernel (ops/pallas_composite_pair.py) runs its grid over ALL
T tiles of every env: untouched tiles (no dynamic gaussians — most of the
image in the env loop, the reference's static ``/scene_ohne_robot`` split,
splat_handler.py:104-119) still DMA their (10, Ks) static payload block
into VMEM and execute a guarded no-op grid step, and the backward emits a
full (T, 10, Ks) static-cotangent block per env.  At B=32 envs that is
~80 % wasted DMA and grid occupancy.

This kernel runs its grid over only the **selected** (dynamic-touched)
tiles of each env — a (B, TT) grid driven by a scalar-prefetched tile-id
table (``pltpu.PrefetchScalarGridSpec``):

- ``ids[b, i]`` names the tile the (b, i) grid step composites; the static
  payload block, the output block, and (backward) the cotangent blocks are
  all index-mapped through it, so only selected tiles move between HBM and
  VMEM.  Slots past the env's touched-tile count carry the pad id T and
  write an empty composite into a dedicated trash row.
- per-tile static/dynamic counts ride the scalar prefetch too (SMEM reads
  ``cs_ref[tid]``), replacing the pair kernel's lane-replicated VMEM hack.
- forward output is (B, T+1, 8, P) — channel-major so the lane dim is the
  P=ts² pixels (a (…, P, 8) layout pads 8 → 128 lanes: 16× HBM) — written
  only at selected rows; the caller MUST select against the once-per-step
  static composite (``build_static_composite``) before consuming
  (unvisited rows are uninitialized), which the cached render path does.
- backward emits *compacted* (B, TT, 10, K) gradient blocks; the shared
  static cache cotangent is recovered with one exact one-hot MXU
  contraction over the B·TT selected slots (``_scatter_rows``) — no
  scatters, no atomics, no (B, T, 10, Ks) dense temps.

The compositing math is identical to ops/pallas_composite_pair.py (same
interleaved-transmittance factorization, tie-breaks, termination and
gradient formulas); outputs agree with the merged-list path to fp32
rounding.  Reference behavior matched: gsplat CUDA rasterizer semantics
(invoked by the reference via nerfstudio, ns_utils/nerfstudio_utils.py:166).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sim_a_splat_tpu.ops.rasterize_reference import ALPHA_CLAMP
from sim_a_splat_tpu.ops.pallas_composite import (
    CHUNK, _ROW_CA, _ROW_CB, _ROW_CC, _ROW_OP, _ROW_RGBD, _ROW_X, _ROW_Y,
    _chunk_geometry, _cumprod_lanes, _cumsum_lanes,
)
from sim_a_splat_tpu.ops.pallas_composite_pair import (
    _ROW_DEPTH, _dot, _dyn_log_alphas, _static_chunk_ind,
)


def _pixel_coords_tid(tid, ts: int, tx: int, dtype):
    """(P, 1) pixel-center coords of tile ``tid`` (traced scalar)."""
    ox = ((tid % tx) * ts).astype(dtype)
    oy = ((tid // tx) * ts).astype(dtype)
    P = ts * ts
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (pidx % ts).astype(dtype) + 0.5 + ox
    py = (pidx // ts).astype(dtype) + 0.5 + oy
    return px, py


def _fwd_kernel(ids_ref, cs_ref, cd_ref, spay_ref, dpay_ref, out_ref,
                *rest, ts, tx, ncs, ndc, power_min, term_eps, exact,
                save_state, per_env):
    if save_state:
        # training forward: also emit the per-slot ltsd state so the
        # backward can skip its pass-A forward replay entirely
        (ltsd_out_ref, acc_ref, ts_ref, ld_ref, ad_ref, ltsd_ref,
         alive_ref) = rest
    else:
        ltsd_out_ref = None
        acc_ref, ts_ref, ld_ref, ad_ref, ltsd_ref, alive_ref = rest
    P = ts * ts
    f32 = spay_ref.dtype
    Kd = dpay_ref.shape[-1]
    b = pl.program_id(0)
    i = pl.program_id(1)
    tid = ids_ref[b, i]
    px, py = _pixel_coords_tid(tid, ts, tx, f32)
    # pad slots: tid = T ⇒ counts_s[…, T] = 0
    count_s = cs_ref[b, tid] if per_env else cs_ref[tid]
    count_d = cd_ref[b, i]

    acc_ref[...] = jnp.zeros((P, 4), f32)
    ts_ref[...] = jnp.ones((P, 1), f32)
    ld_ref[...] = jnp.zeros((P, Kd), f32)
    ad_ref[...] = jnp.zeros((P, Kd), f32)
    ltsd_ref[...] = jnp.zeros((P, Kd), f32)
    alive_ref[0] = jnp.int32(1)
    alive_ref[1] = jnp.int32(0)    # applied-chunk count (a prefix: the
                                   # alive bit only ever falls)

    _dyn_log_alphas(dpay_ref, count_d, px, py, power_min, ld_ref, ad_ref, ndc)
    dd = dpay_ref[_ROW_DEPTH:_ROW_DEPTH + 1, :]               # (1, Kd)

    for c in range(ncs):                                      # static unroll
        c0 = c * CHUNK

        @pl.when((alive_ref[0] == 1) & (c0 < count_s) & (count_d > 0))
        def _():
            alive_ref[1] = alive_ref[1] + 1
            alpha, _, _, _, _, _, _, _ = _chunk_geometry(
                spay_ref, c0, px, py, power_min)
            ls = jnp.log1p(-alpha)
            cs = _cumsum_lanes(ls, CHUNK)
            ind, ds = _static_chunk_ind(spay_ref, c0, dd)     # (C, Kd)
            ld = ld_ref[...]
            sum_ld = jnp.sum(ld, axis=1, keepdims=True)       # (P, 1)
            logtd = sum_ld - _dot(ld, ind, ((1,), (1,)), exact=exact)  # (P, C)
            tsv = ts_ref[...]
            w = alpha * jnp.exp(cs - ls + logtd) * tsv        # (P, C)
            crgbd = spay_ref[_ROW_RGBD, c0:c0 + CHUNK]        # (4, C)
            acc_ref[...] += _dot(w, crgbd, ((1,), (1,)))
            ltsd_ref[...] += _dot(ls, ind, ((1,), (0,)), exact=exact)  # (P, Kd)
            ts_new = tsv * jnp.exp(cs[:, CHUNK - 1:CHUNK])
            ts_ref[...] = ts_new
            if term_eps is not None:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                act = lane < (count_s - c0)
                dbound = jnp.max(jnp.where(act, ds, -jnp.inf))
                # skinny (P,Kd)·(Kd,1) contraction as an exact VPU masked
                # reduce (Mosaic lowers it as a multi_reduction anyway)
                td_b = jnp.exp(jnp.sum(
                    jnp.where(dd < dbound, ld, 0.0), axis=1, keepdims=True))
                alive_ref[0] = (jnp.max(ts_new * td_b)
                                >= term_eps).astype(jnp.int32)

        # dyn-free specialization: with no dynamic entries in the tile the
        # interleave state is trivial (ld ≡ 0 ⇒ logtd ≡ 0, ltsd untouched),
        # so the two big (·,Kd)-class exact MXU dots vanish and the chunk
        # reduces to a plain single-list composite step.  The moving-camera
        # dense path composites ~90% dyn-free tiles per env — this is most
        # of its kernel time (the fixed sel path selects only dyn-touched
        # tiles, so it never takes this branch).
        @pl.when((alive_ref[0] == 1) & (c0 < count_s) & (count_d == 0))
        def _():
            alive_ref[1] = alive_ref[1] + 1
            alpha, _, _, _, _, _, _, _ = _chunk_geometry(
                spay_ref, c0, px, py, power_min)
            ls = jnp.log1p(-alpha)
            cs = _cumsum_lanes(ls, CHUNK)
            tsv = ts_ref[...]
            w = alpha * jnp.exp(cs - ls) * tsv                # (P, C)
            crgbd = spay_ref[_ROW_RGBD, c0:c0 + CHUNK]        # (4, C)
            acc_ref[...] += _dot(w, crgbd, ((1,), (1,)))
            ts_new = tsv * jnp.exp(cs[:, CHUNK - 1:CHUNK])
            ts_ref[...] = ts_new
            if term_eps is not None:
                alive_ref[0] = (jnp.max(ts_new)
                                >= term_eps).astype(jnp.int32)

    @pl.when(count_d > 0)
    def _():
        ld = ld_ref[...]
        csd = _cumsum_lanes(ld, Kd)
        wd = ad_ref[...] * jnp.exp(csd - ld + ltsd_ref[...])  # (P, Kd)
        crgbd_d = dpay_ref[_ROW_RGBD, :]                      # (4, Kd)
        acc_ref[...] += _dot(wd, crgbd_d, ((1,), (1,)))

    # channel-major (8, P) output block: a (…, P, 8) layout pads the lane
    # dim 8 → 128 (16× HBM expansion, the round-4 OOM at B=128); (…, 8, P)
    # tiles exactly.  One small in-VMEM transpose per tile.  Row 5 (spare)
    # carries the applied-chunk count in the training forward — the
    # backward's gating state — so no extra scalar output is needed.
    sum_ld = jnp.sum(ld_ref[...], axis=1, keepdims=True)
    napp = jnp.full((P, 1), alive_ref[1], f32) if save_state else \
        jnp.zeros((P, 1), f32)
    res = jnp.concatenate(
        [acc_ref[...], ts_ref[...] * jnp.exp(sum_ld), napp,
         jnp.zeros((P, 2), f32)], axis=1)                     # (P, 8)
    out_ref[...] = res.T
    if save_state:
        ltsd_out_ref[...] = ltsd_ref[...]


def _bwd_kernel(ids_ref, cs_ref, cd_ref, spay_ref, dpay_ref, ct_ref,
                fwd_ref, ltsd_in_ref, gs_ref, gd_ref,
                ts_ref, ld_ref, ad_ref, prefix_ref, sdyn_ref,
                bdwd_ref,
                *, ts, tx, ncs, ndc, power_min, term_eps, exact_fwd,
                exact_bwd, per_env):
    """Gradient kernel.  The forward's sequential transmittance state is
    NOT replayed (the round-3 pass A): the training forward saves its
    exact ltsd (dyn log-transmittance-from-statics) block and encodes the
    applied-chunk count in output row 5, so this kernel starts directly
    at the gradient walk — ~⅓ less work, bit-identical gating."""
    P = ts * ts
    f32 = spay_ref.dtype
    Kd = dpay_ref.shape[-1]
    b = pl.program_id(0)
    i = pl.program_id(1)
    tid = ids_ref[b, i]
    px, py = _pixel_coords_tid(tid, ts, tx, f32)
    count_s = cs_ref[b, tid] if per_env else cs_ref[tid]
    count_d = cd_ref[b, i]

    gs_ref[...] = jnp.zeros_like(gs_ref)
    gd_ref[...] = jnp.zeros_like(gd_ref)
    ts_ref[...] = jnp.ones((P, 1), f32)
    ld_ref[...] = jnp.zeros((P, Kd), f32)
    ad_ref[...] = jnp.zeros((P, Kd), f32)
    sdyn_ref[...] = jnp.zeros((P, Kd), f32)
    prefix_ref[...] = jnp.zeros((P, 1), f32)

    _dyn_log_alphas(dpay_ref, count_d, px, py, power_min, ld_ref, ad_ref, ndc)
    dd = dpay_ref[_ROW_DEPTH:_ROW_DEPTH + 1, :]

    ct_t = ct_ref[...].T                                      # (P, 8)
    fwd_t = fwd_ref[...].T                                    # (P, 8)
    ct_rgbd = ct_t[:, 0:4]                                    # (P, 4)
    ct_tc = ct_t[:, 4:5]
    s_tot = jnp.sum(ct_rgbd * fwd_t[:, 0:4], axis=1, keepdims=True)
    trans_term = ct_tc * fwd_t[:, 4:5]
    # applied-chunk count saved by the forward (row 5, broadcast over P —
    # reduce to a scalar; scalar VMEM loads don't lower cleanly in Mosaic)
    n_applied = jnp.max(fwd_t[:, 5]).astype(jnp.int32)

    ld = ld_ref[...]
    ad = ad_ref[...]
    csd = _cumsum_lanes(ld, Kd)
    texcl_d = jnp.exp(csd - ld + ltsd_in_ref[...])            # (P, Kd)
    wd = ad * texcl_d
    crgbd_d = dpay_ref[_ROW_RGBD, :]
    bd = _dot(ct_rgbd, crgbd_d, ((1,), (0,)))                 # (P, Kd)
    bdwd_ref[...] = bd * wd
    sum_bdwd = jnp.sum(bdwd_ref[...], axis=1, keepdims=True)  # (P, 1)

    # ---- pass B: static gradients with union suffix sums ----
    def static_grad_chunk(c0, alpha, active, expp, dx, dy, ca, cb, cc,
                          texcl_u, suffix, bs):
        """Shared tail of the static-chunk gradient (both dyn branches)."""
        one_m = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_CLAMP)
        dalpha = bs * texcl_u - (suffix + trans_term) / one_m
        w = alpha * texcl_u
        dop_pc = dalpha * expp * active
        dpower = dalpha * alpha * active
        ddx = dpower * (-(ca * dx + cb * dy))
        ddy = dpower * (-(cc * dy + cb * dx))
        sl = slice(c0, c0 + CHUNK)
        gs_ref[_ROW_X:_ROW_X + 1, sl] = -jnp.sum(
            ddx, axis=0, keepdims=True)
        gs_ref[_ROW_Y:_ROW_Y + 1, sl] = -jnp.sum(
            ddy, axis=0, keepdims=True)
        gs_ref[_ROW_CA:_ROW_CA + 1, sl] = jnp.sum(
            dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
        gs_ref[_ROW_CB:_ROW_CB + 1, sl] = jnp.sum(
            dpower * (-dx * dy), axis=0, keepdims=True)
        gs_ref[_ROW_CC:_ROW_CC + 1, sl] = jnp.sum(
            dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
        gs_ref[_ROW_RGBD, sl] = _dot(ct_rgbd, w, ((0,), (0,)))
        gs_ref[_ROW_OP:_ROW_OP + 1, sl] = jnp.sum(
            dop_pc, axis=0, keepdims=True)

    for c in range(ncs):
        c0 = c * CHUNK

        @pl.when((c < n_applied) & (count_d > 0))
        def _():
            alpha, active, expp, dx, dy, ca, cb, cc = _chunk_geometry(
                spay_ref, c0, px, py, power_min)
            om = 1.0 - alpha
            cp = _cumprod_lanes(om, CHUNK)
            ind, _ = _static_chunk_ind(spay_ref, c0, dd)
            bdwd = bdwd_ref[...]
            logtd = (jnp.sum(ld_ref[...], axis=1, keepdims=True)
                     - _dot(ld_ref[...], ind, ((1,), (1,)), exact=exact_bwd))
            tsv = ts_ref[...]
            texcl_u = (cp / om) * jnp.exp(logtd) * tsv        # w/α
            crgbd = spay_ref[_ROW_RGBD, c0:c0 + CHUNK]
            bs = _dot(ct_rgbd, crgbd, ((1,), (0,)))           # (P, C)
            bw = bs * alpha * texcl_u
            incl = _cumsum_lanes(bw, CHUNK)
            sd_before = sum_bdwd - _dot(bdwd, ind, ((1,), (1,)), exact=exact_bwd)
            suffix = s_tot - (prefix_ref[...] + incl + sd_before)
            static_grad_chunk(c0, alpha, active, expp, dx, dy, ca, cb, cc,
                              texcl_u, suffix, bs)

            sdyn_ref[...] += _dot(bw, ind, ((1,), (0,)), exact=exact_bwd)
            prefix_ref[...] += incl[:, CHUNK - 1:CHUNK]
            ts_ref[...] = tsv * cp[:, CHUNK - 1:CHUNK]

        # dyn-free specialization (see the forward kernel): ld ≡ 0 and
        # bdwd ≡ 0 make logtd/sd_before/sdyn trivial — all three
        # (·,Kd)-class dots drop out of the chunk.
        @pl.when((c < n_applied) & (count_d == 0))
        def _():
            alpha, active, expp, dx, dy, ca, cb, cc = _chunk_geometry(
                spay_ref, c0, px, py, power_min)
            om = 1.0 - alpha
            cp = _cumprod_lanes(om, CHUNK)
            tsv = ts_ref[...]
            texcl_u = (cp / om) * tsv                         # w/α
            crgbd = spay_ref[_ROW_RGBD, c0:c0 + CHUNK]
            bs0 = _dot(ct_rgbd, crgbd, ((1,), (0,)))          # (P, C)
            bw = bs0 * alpha * texcl_u
            incl = _cumsum_lanes(bw, CHUNK)
            suffix = s_tot - (prefix_ref[...] + incl)
            static_grad_chunk(c0, alpha, active, expp, dx, dy, ca, cb, cc,
                              texcl_u, suffix, bs0)
            prefix_ref[...] += incl[:, CHUNK - 1:CHUNK]
            ts_ref[...] = tsv * cp[:, CHUNK - 1:CHUNK]

    # ---- dynamic gradients ----
    @pl.when(count_d > 0)
    def _():
        incl_d = _cumsum_lanes(bdwd_ref[...], Kd)
        suffix_d = s_tot - (sdyn_ref[...] + incl_d)
        one_m_d = jnp.maximum(1.0 - ad, 1.0 - ALPHA_CLAMP)
        dalpha_d = bd * texcl_d - (suffix_d + trans_term) / one_m_d
        for dc in range(ndc):
            c0 = dc * CHUNK

            @pl.when(c0 < count_d)
            def _():
                alpha, active, expp, dx, dy, ca, cb, cc = _chunk_geometry(
                    dpay_ref, c0, px, py, power_min)
                da = dalpha_d[:, c0:c0 + CHUNK]
                dop_pc = da * expp * active
                dpower = da * alpha * active
                ddx = dpower * (-(ca * dx + cb * dy))
                ddy = dpower * (-(cc * dy + cb * dx))
                sl = slice(c0, c0 + CHUNK)
                gd_ref[_ROW_X:_ROW_X + 1, sl] = -jnp.sum(
                    ddx, axis=0, keepdims=True)
                gd_ref[_ROW_Y:_ROW_Y + 1, sl] = -jnp.sum(
                    ddy, axis=0, keepdims=True)
                gd_ref[_ROW_CA:_ROW_CA + 1, sl] = jnp.sum(
                    dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
                gd_ref[_ROW_CB:_ROW_CB + 1, sl] = jnp.sum(
                    dpower * (-dx * dy), axis=0, keepdims=True)
                gd_ref[_ROW_CC:_ROW_CC + 1, sl] = jnp.sum(
                    dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
                gd_ref[_ROW_RGBD, sl] = _dot(
                    ct_rgbd, wd[:, c0:c0 + CHUNK], ((0,), (0,)))
                gd_ref[_ROW_OP:_ROW_OP + 1, sl] = jnp.sum(
                    dop_pc, axis=0, keepdims=True)


def _fwd_kernel_single(ids_ref, cs_ref, spay_ref, out_ref, acc_ref, ts_ref,
                       alive_ref, *, ts, tx, ncs, power_min, term_eps,
                       per_env, save_state):
    """Single-list forward: one depth-sorted per-tile list, no dynamic
    interleave state at all — the moving-camera path merges its per-frame
    dynamics INTO the candidate list before the kernel, so every tile
    walks the plain front-to-back recurrence (the dyn-free branch of
    ``_fwd_kernel``) and the backward needs only the applied-chunk count
    (row 5), never an ltsd block.  That keeps the rollout scan's saved
    residuals at payload+output size, small enough to avoid remat's
    double forward."""
    P = ts * ts
    f32 = spay_ref.dtype
    b = pl.program_id(0)
    i = pl.program_id(1)
    tid = ids_ref[b, i]
    px, py = _pixel_coords_tid(tid, ts, tx, f32)
    count_s = cs_ref[b, tid] if per_env else cs_ref[tid]

    acc_ref[...] = jnp.zeros((P, 4), f32)
    ts_ref[...] = jnp.ones((P, 1), f32)
    alive_ref[0] = jnp.int32(1)
    alive_ref[1] = jnp.int32(0)

    for c in range(ncs):
        c0 = c * CHUNK

        @pl.when((alive_ref[0] == 1) & (c0 < count_s))
        def _():
            alive_ref[1] = alive_ref[1] + 1
            alpha, _, _, _, _, _, _, _ = _chunk_geometry(
                spay_ref, c0, px, py, power_min)
            ls = jnp.log1p(-alpha)
            cs = _cumsum_lanes(ls, CHUNK)
            tsv = ts_ref[...]
            w = alpha * jnp.exp(cs - ls) * tsv
            crgbd = spay_ref[_ROW_RGBD, c0:c0 + CHUNK]
            acc_ref[...] += _dot(w, crgbd, ((1,), (1,)))
            ts_new = tsv * jnp.exp(cs[:, CHUNK - 1:CHUNK])
            ts_ref[...] = ts_new
            if term_eps is not None:
                alive_ref[0] = (jnp.max(ts_new)
                                >= term_eps).astype(jnp.int32)

    napp = jnp.full((P, 1), alive_ref[1], f32) if save_state else \
        jnp.zeros((P, 1), f32)
    res = jnp.concatenate(
        [acc_ref[...], ts_ref[...], napp, jnp.zeros((P, 2), f32)], axis=1)
    out_ref[...] = res.T


def _bwd_kernel_single(ids_ref, cs_ref, spay_ref, ct_ref, fwd_ref, gs_ref,
                       ts_ref, prefix_ref, *, ts, tx, ncs, power_min,
                       per_env):
    """Single-list gradient walk — the dyn-free branch of ``_bwd_kernel``
    standalone: rebuilds exclusive transmittances forward from the
    payload (cheap per-chunk recompute, no saved state beyond the
    forward's applied-chunk count in row 5)."""
    P = ts * ts
    f32 = spay_ref.dtype
    b = pl.program_id(0)
    i = pl.program_id(1)
    tid = ids_ref[b, i]
    px, py = _pixel_coords_tid(tid, ts, tx, f32)

    gs_ref[...] = jnp.zeros_like(gs_ref)
    ts_ref[...] = jnp.ones((P, 1), f32)
    prefix_ref[...] = jnp.zeros((P, 1), f32)

    ct_t = ct_ref[...].T                                      # (P, 8)
    fwd_t = fwd_ref[...].T
    ct_rgbd = ct_t[:, 0:4]
    ct_tc = ct_t[:, 4:5]
    s_tot = jnp.sum(ct_rgbd * fwd_t[:, 0:4], axis=1, keepdims=True)
    trans_term = ct_tc * fwd_t[:, 4:5]
    n_applied = jnp.max(fwd_t[:, 5]).astype(jnp.int32)

    for c in range(ncs):
        c0 = c * CHUNK

        @pl.when(c < n_applied)
        def _():
            alpha, active, expp, dx, dy, ca, cb, cc = _chunk_geometry(
                spay_ref, c0, px, py, power_min)
            om = 1.0 - alpha
            cp = _cumprod_lanes(om, CHUNK)
            tsv = ts_ref[...]
            texcl_u = (cp / om) * tsv
            crgbd = spay_ref[_ROW_RGBD, c0:c0 + CHUNK]
            bs = _dot(ct_rgbd, crgbd, ((1,), (0,)))           # (P, C)
            bw = bs * alpha * texcl_u
            incl = _cumsum_lanes(bw, CHUNK)
            suffix = s_tot - (prefix_ref[...] + incl)
            one_m = jnp.maximum(om, 1.0 - ALPHA_CLAMP)
            dalpha = bs * texcl_u - (suffix + trans_term) / one_m
            dop_pc = dalpha * expp * active
            dpower = dalpha * alpha * active
            ddx = dpower * (-(ca * dx + cb * dy))
            ddy = dpower * (-(cc * dy + cb * dx))
            sl = slice(c0, c0 + CHUNK)
            gs_ref[_ROW_X:_ROW_X + 1, sl] = -jnp.sum(
                ddx, axis=0, keepdims=True)
            gs_ref[_ROW_Y:_ROW_Y + 1, sl] = -jnp.sum(
                ddy, axis=0, keepdims=True)
            gs_ref[_ROW_CA:_ROW_CA + 1, sl] = jnp.sum(
                dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
            gs_ref[_ROW_CB:_ROW_CB + 1, sl] = jnp.sum(
                dpower * (-dx * dy), axis=0, keepdims=True)
            gs_ref[_ROW_CC:_ROW_CC + 1, sl] = jnp.sum(
                dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
            gs_ref[_ROW_RGBD, sl] = _dot(ct_rgbd, alpha * texcl_u,
                                         ((0,), (0,)))
            gs_ref[_ROW_OP:_ROW_OP + 1, sl] = jnp.sum(
                dop_pc, axis=0, keepdims=True)
            prefix_ref[...] += incl[:, CHUNK - 1:CHUNK]
            ts_ref[...] = tsv * cp[:, CHUNK - 1:CHUNK]


def _call_single_fwd(spay_pad, ids, counts_s_pad, ts, tx, power_min,
                     interpret, term_eps, save_state=False):
    per_env = spay_pad.ndim == 4
    T1, Ks = spay_pad.shape[-3], spay_pad.shape[-1]
    B, TT = ids.shape
    P = ts * ts
    kern = functools.partial(
        _fwd_kernel_single, ts=ts, tx=tx, ncs=Ks // CHUNK,
        power_min=power_min, term_eps=term_eps, per_env=per_env,
        save_state=save_state)
    spay_spec = (
        pl.BlockSpec((None, None, 10, Ks),
                     lambda b, i, ids, cs: (b, ids[b, i], 0, 0))
        if per_env else
        pl.BlockSpec((None, 10, Ks),
                     lambda b, i, ids, cs: (ids[b, i], 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, TT),
        in_specs=[spay_spec],
        out_specs=pl.BlockSpec(
            (None, None, 8, P), lambda b, i, ids, cs: (b, ids[b, i], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((P, 4), spay_pad.dtype),
            pltpu.VMEM((P, 1), spay_pad.dtype),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T1, 8, P), spay_pad.dtype),
        interpret=interpret,
    )(ids, counts_s_pad, spay_pad)


def _call_single_bwd(spay_pad, ids, counts_s_pad, ct, fwd_out, ts, tx,
                     power_min, interpret):
    per_env = spay_pad.ndim == 4
    T1, Ks = spay_pad.shape[-3], spay_pad.shape[-1]
    B, TT = ids.shape
    P = ts * ts
    kern = functools.partial(
        _bwd_kernel_single, ts=ts, tx=tx, ncs=Ks // CHUNK,
        power_min=power_min, per_env=per_env)
    spay_spec = (
        pl.BlockSpec((None, None, 10, Ks),
                     lambda b, i, ids, cs: (b, ids[b, i], 0, 0))
        if per_env else
        pl.BlockSpec((None, 10, Ks),
                     lambda b, i, ids, cs: (ids[b, i], 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, TT),
        in_specs=[
            spay_spec,
            pl.BlockSpec((None, None, 8, P),
                         lambda b, i, ids, cs: (b, ids[b, i], 0, 0)),
            pl.BlockSpec((None, None, 8, P),
                         lambda b, i, ids, cs: (b, ids[b, i], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, None, 10, Ks), lambda b, i, ids, cs: (b, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((P, 1), spay_pad.dtype),
            pltpu.VMEM((P, 1), spay_pad.dtype),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, TT, 10, Ks), spay_pad.dtype),
        interpret=interpret,
    )(ids, counts_s_pad, spay_pad, ct, fwd_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def composite_sel_single(spay_pad, ids, counts_s_pad, ts: int, tx: int,
                         sigma_cutoff: Optional[float], interpret: bool,
                         term_eps: Optional[float] = None):
    """Single-list selected-tile composite (per-env or shared payload).

    Same contract as :func:`composite_pair_sel` with the dynamic list
    empty — used by the moving-camera path, which merges per-frame
    dynamics into the depth-sorted candidate list before compositing.
    Returns (B, T+1, 8, P); rows 5-7 are kernel-internal (the training
    forward stashes the applied-chunk count in row 5).
    """
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    return _call_single_fwd(spay_pad, ids, counts_s_pad, ts, tx, pmin,
                            interpret, term_eps)


def _single_fwd(spay_pad, ids, counts_s_pad, ts, tx, sigma_cutoff,
                interpret, term_eps):
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    out = _call_single_fwd(spay_pad, ids, counts_s_pad, ts, tx, pmin,
                           interpret, term_eps, save_state=True)
    return out, (spay_pad, ids, counts_s_pad, out)


def _single_bwd(ts, tx, sigma_cutoff, interpret, term_eps, res, ct):
    import numpy as _np

    spay_pad, ids, counts_s_pad, out = res
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    gs_sel = _call_single_bwd(spay_pad, ids, counts_s_pad, ct, out, ts, tx,
                              pmin, interpret)
    if spay_pad.ndim == 4:
        gs_pad = jnp.concatenate(
            [gs_sel, jnp.zeros_like(gs_sel[:, :1])], axis=1)
    else:
        gs_pad = _scatter_rows(gs_sel, ids, spay_pad.shape[0])
    zero = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
    return gs_pad, zero(ids), zero(counts_s_pad)


composite_sel_single.defvjp(_single_fwd, _single_bwd)


def _call_fwd(spay_pad, dpay, ids, counts_s_pad, counts_d, ts, tx,
              power_min, interpret, term_eps, exact, save_state=False):
    per_env = spay_pad.ndim == 4      # (B, T+1, 10, Ks) per-env payload
    T1, Ks = spay_pad.shape[-3], spay_pad.shape[-1]
    B, TT = ids.shape
    Kd = dpay.shape[-1]
    P = ts * ts
    kern = functools.partial(
        _fwd_kernel, ts=ts, tx=tx, ncs=Ks // CHUNK, ndc=Kd // CHUNK,
        power_min=power_min, term_eps=term_eps, exact=exact,
        save_state=save_state, per_env=per_env)
    out_specs = pl.BlockSpec(
        (None, None, 8, P), lambda b, i, ids, cs, cd: (b, ids[b, i], 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, T1, 8, P), spay_pad.dtype)
    if save_state:
        out_specs = [out_specs, pl.BlockSpec(
            (None, None, P, Kd), lambda b, i, ids, cs, cd: (b, i, 0, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, TT, P, Kd), spay_pad.dtype)]
    spay_spec = (
        pl.BlockSpec((None, None, 10, Ks),
                     lambda b, i, ids, cs, cd: (b, ids[b, i], 0, 0))
        if per_env else
        pl.BlockSpec((None, 10, Ks),
                     lambda b, i, ids, cs, cd: (ids[b, i], 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, TT),
        in_specs=[
            spay_spec,
            pl.BlockSpec((None, None, 10, Kd),
                         lambda b, i, ids, cs, cd: (b, i, 0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((P, 4), spay_pad.dtype),
            pltpu.VMEM((P, 1), spay_pad.dtype),
            pltpu.VMEM((P, Kd), spay_pad.dtype),
            pltpu.VMEM((P, Kd), spay_pad.dtype),
            pltpu.VMEM((P, Kd), spay_pad.dtype),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ids, counts_s_pad, counts_d, spay_pad, dpay)


def _call_bwd(spay_pad, dpay, ids, counts_s_pad, counts_d, ct, fwd_out,
              ltsd, ts, tx, power_min, interpret, term_eps, exact_fwd,
              exact_bwd):
    per_env = spay_pad.ndim == 4
    T1, Ks = spay_pad.shape[-3], spay_pad.shape[-1]
    B, TT = ids.shape
    Kd = dpay.shape[-1]
    P = ts * ts
    ncs = Ks // CHUNK
    kern = functools.partial(
        _bwd_kernel, ts=ts, tx=tx, ncs=ncs, ndc=Kd // CHUNK,
        power_min=power_min, term_eps=term_eps, exact_fwd=exact_fwd,
        exact_bwd=exact_bwd, per_env=per_env)
    spay_spec = (
        pl.BlockSpec((None, None, 10, Ks),
                     lambda b, i, ids, cs, cd: (b, ids[b, i], 0, 0))
        if per_env else
        pl.BlockSpec((None, 10, Ks),
                     lambda b, i, ids, cs, cd: (ids[b, i], 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, TT),
        in_specs=[
            spay_spec,
            pl.BlockSpec((None, None, 10, Kd),
                         lambda b, i, ids, cs, cd: (b, i, 0, 0)),
            pl.BlockSpec((None, None, 8, P),
                         lambda b, i, ids, cs, cd: (b, ids[b, i], 0, 0)),
            pl.BlockSpec((None, None, 8, P),
                         lambda b, i, ids, cs, cd: (b, ids[b, i], 0, 0)),
            pl.BlockSpec((None, None, P, Kd),
                         lambda b, i, ids, cs, cd: (b, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, None, 10, Ks),
                         lambda b, i, ids, cs, cd: (b, i, 0, 0)),
            pl.BlockSpec((None, None, 10, Kd),
                         lambda b, i, ids, cs, cd: (b, i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 1), spay_pad.dtype),    # ts carry
            pltpu.VMEM((P, Kd), spay_pad.dtype),   # ld
            pltpu.VMEM((P, Kd), spay_pad.dtype),   # ad
            pltpu.VMEM((P, 1), spay_pad.dtype),    # static prefix
            pltpu.VMEM((P, Kd), spay_pad.dtype),   # Σ bs·ws before dyn
            pltpu.VMEM((P, Kd), spay_pad.dtype),   # bd·wd
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, TT, 10, Ks), spay_pad.dtype),
            jax.ShapeDtypeStruct((B, TT, 10, Kd), spay_pad.dtype),
        ],
        interpret=interpret,
    )(ids, counts_s_pad, counts_d, spay_pad, dpay, ct, fwd_out, ltsd)


def _scatter_rows(gs_sel: jnp.ndarray, ids: jnp.ndarray, T1: int):
    """(B, TT, 10, Ks) compacted static cotangents + (B, TT) tile ids →
    (T1, 10, Ks) summed per tile, as ONE one-hot MXU contraction (exact:
    full-f32 passes; the one-hot side is 0/1).  Pad slots (id = T1−1)
    accumulate into the trash row, which the caller slices off."""
    B, TT, R, Ks = gs_sel.shape
    flat_ids = ids.reshape(B * TT)
    onehot = (flat_ids[:, None]
              == jnp.arange(T1, dtype=jnp.int32)[None, :]).astype(
                  gs_sel.dtype)                               # (B·TT, T1)
    flat = gs_sel.reshape(B * TT, R * Ks)
    out = jax.lax.dot_general(
        onehot, flat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                  # (T1, R·Ks)
    return out.reshape(T1, R, Ks)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def composite_pair_sel(spay_pad, dpay, ids, counts_s_pad, counts_d,
                       ts: int, tx: int, sigma_cutoff: Optional[float],
                       interpret: bool, term_eps: Optional[float] = None,
                       exact_fwd: bool = True, exact_bwd: bool = False):
    """Selected-tile interleaved composite.

    Args:
      spay_pad: (T+1, 10, Ks) static per-tile payload with a zero trash row
        at index T (``_pack_payload`` layout, Ks % 128 == 0).  A 4-D
        (B, T+1, 10, Ks) payload selects PER-ENV static lists (the
        moving-camera candidate path, ops/rasterize_moving.py); in that
        mode ``ids`` MUST be the dense table ids[b] = arange(T) with
        TT == T (the backward maps slot cotangents to tiles by position).
      dpay: (B, TT, 10, Kd) compacted per-env dynamic lists (Kd % 128 == 0).
      ids: (B, TT) int32 tile ids; pad slots carry T.  Pad slots MUST come
        after all real slots (selection sorts by descending count).
      counts_s_pad: (T+1,) int32 active static entries (0 at the trash
        row); (B, T+1) per env when ``spay_pad`` is per-env.
      counts_d: (B, TT) int32 active dynamic entries (0 at pad slots).

    Returns (B, T+1, 8, P) channel-major per-pixel [rgb, depth_acc, trans,
    rows 5-7] written ONLY at selected rows — unselected rows are
    uninitialized and the trash row is the pads' empty composite; the
    caller must where-select against the static composite before
    consuming.  Rows 5-7 are 0×3 in the primal; under differentiation the
    training forward (``_sel_fwd``, save_state=True) stashes the
    applied-static-chunk count in row 5 as backward state — consumers must
    treat rows 5-7 as kernel-internal, never as data (their cotangents are
    ignored).
    """
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    return _call_fwd(spay_pad, dpay, ids, counts_s_pad, counts_d, ts, tx,
                     pmin, interpret, term_eps, exact_fwd)


def _sel_fwd(spay_pad, dpay, ids, counts_s_pad, counts_d, ts, tx,
             sigma_cutoff, interpret, term_eps, exact_fwd, exact_bwd):
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    out, ltsd = _call_fwd(spay_pad, dpay, ids, counts_s_pad, counts_d, ts,
                          tx, pmin, interpret, term_eps, exact_fwd,
                          save_state=True)
    return out, (spay_pad, dpay, ids, counts_s_pad, counts_d, out, ltsd)


def _sel_bwd(ts, tx, sigma_cutoff, interpret, term_eps, exact_fwd,
             exact_bwd, res, ct):
    import numpy as _np

    spay_pad, dpay, ids, counts_s_pad, counts_d, out, ltsd = res
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    gs_sel, gd = _call_bwd(spay_pad, dpay, ids, counts_s_pad, counts_d,
                           ct, out, ltsd, ts, tx, pmin, interpret, term_eps,
                           exact_fwd, exact_bwd)
    if spay_pad.ndim == 4:
        # per-env static payload: the dense-ids contract (ids[b] = arange)
        # makes slot i's cotangent exactly tile i's — pad the trash row
        gs_pad = jnp.concatenate(
            [gs_sel, jnp.zeros_like(gs_sel[:, :1])], axis=1)
    else:
        gs_pad = _scatter_rows(gs_sel, ids, spay_pad.shape[0])
    zero = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
    return gs_pad, gd, zero(ids), zero(counts_s_pad), zero(counts_d)


composite_pair_sel.defvjp(_sel_fwd, _sel_bwd)
