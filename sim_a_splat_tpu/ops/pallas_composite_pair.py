"""Fused static+dynamic interleaved compositing — the merge-free cached path.

The cached renderer (ops/rasterize_cached.py) used to materialize, per env,
a merged (T, Ks+Kd, 10) depth-sorted list (merge-path positions + a
multi-operand ``lax.sort`` apply) and feed it to the plain compositing
kernel.  At B=32 envs that is ~12 MB of HBM written *and* re-read per env
per step, and the merge itself was ~25 % of the round-2 frame time
(PROFILE.md).

This kernel removes the merge entirely: it composites the *shared* static
per-tile lists (built once per train step) and the small per-env dynamic
lists jointly, computing the exact depth-interleaved transmittance
algebraically.  The key identity: front-to-back weights over the merged
sequence factorize,

    w_i(static) = α_i · Ts_excl(i) · Td(<d_i)
    w_j(dyn)    = α_j · Td_excl(j) · Ts(≤d_j)

where ``Ts_excl`` is the static-only exclusive transmittance (the ordinary
in-chunk log-space scan), and ``Td(<d)`` / ``Ts(≤d)`` are the opposite
list's transmittance restricted to entries in front of depth ``d``.  Because
``log T(<d) = Σ_j 1[d_j < d] · log(1-α_j)`` and the depth indicator matrix
is pixel-independent, each restricted transmittance is ONE small MXU
contraction per chunk: ``(P, Kd) log-alphas × (Kd, C) indicators``.  The
tie-break (static-before-dynamic at equal depth: strict ``<`` one way,
``≤`` the other) matches ``merge_sorted_lists`` exactly, so outputs are
bit-comparable to the merged path up to fp32 rounding.

Backward: the same gsplat suffix-sum gradient formulas hold over the union;
the union prefix at a static entry again splits into a static running
prefix plus an indicator contraction of the dynamic cotangent-weighted
weights (and vice versa).  Two recompute passes over the static chunks, no
stored per-chunk carries at all (the backward replays the forward's
sequential transmittance/termination state exactly), no scatters, no
atomics.

Early termination (``term_eps``): gates only the static chunk loop, on the
*combined* frontier transmittance ``ts · Td(chunk max depth)``.  Dynamic
entries are always composited in full — every dynamic entry behind the
terminated frontier satisfies ``w ≤ α · ts_term · Td(frontier) ≤ term_eps``
per pixel, so the error bound is the same O(term_eps) as gsplat's stop.

Reference behavior matched: gsplat CUDA rasterize_backward kernel semantics
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
    _chunk_geometry, _cumprod_lanes, _cumsum_lanes, _pixel_coords,
)

_ROW_DEPTH = 8


def _to_col(row: jnp.ndarray) -> jnp.ndarray:
    """(1, C) lane vector → (C, 1) sublane vector.  Mosaic lowers this 2-D
    transpose exactly (verified bit-exact on v5e); exactness matters because
    the result feeds depth-order comparisons."""
    return jnp.transpose(row)


def _dot(a, b, dims, exact=False):
    """MXU contraction.  ``exact=True`` forces full-f32 passes (HIGHEST,
    6 bf16 passes) — required for the log-transmittance / depth-indicator
    contractions, where the MXU's default 1-pass bf16 rounding (a)
    perturbs log-space sums by ~0.4 % and (b) would round depths before
    order comparisons.  ``exact='split'`` exploits that ``b`` is a 0/1
    indicator (exactly representable in bf16): a 3-term bf16 split of
    ``a`` (hi + mid + lo covers the full f32 mantissa) makes THREE
    default-precision passes match HIGHEST to f32-accumulation order —
    2× cheaper (round-4; chip-validated max image diff vs HIGHEST ~1e-6).
    Color/cotangent accumulations keep the default precision, matching
    the merged-list compositing kernel bit-for-bit."""
    if exact == "split":
        def one(term):
            return jax.lax.dot_general(
                term, b, (dims, ((), ())),
                preferred_element_type=jnp.float32)

        a1 = a.astype(jnp.bfloat16).astype(jnp.float32)
        r = a - a1
        a2 = r.astype(jnp.bfloat16).astype(jnp.float32)
        return one(a1) + one(a2) + one(r - a2)
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else None)


def _dyn_log_alphas(dpay_ref, count_d, px, py, power_min, ld_ref, ad_ref,
                    ndc):
    """Fill (P, Kd) dynamic alpha / log(1-alpha) buffers (zero past count)."""
    for dc in range(ndc):
        c0 = dc * CHUNK

        @pl.when(c0 < count_d)
        def _():
            alpha, _, _, _, _, _, _, _ = _chunk_geometry(
                dpay_ref, c0, px, py, power_min)
            ad_ref[:, c0:c0 + CHUNK] = alpha
            ld_ref[:, c0:c0 + CHUNK] = jnp.log1p(-alpha)


def _static_chunk_ind(spay_ref, c0, dd):
    """(C, Kd) indicator ``ds_i ≤ dd_j`` (static entry i in front of dynamic
    entry j; ties → static first, matching merge_sorted_lists)."""
    ds = spay_ref[_ROW_DEPTH:_ROW_DEPTH + 1, c0:c0 + CHUNK]   # (1, C)
    ds_col = _to_col(ds)                                      # (C, 1)
    return (ds_col <= dd).astype(ds.dtype), ds


def _fwd_kernel(cs_ref, cd_ref, skip_ref, spay_ref, dpay_ref, out_ref,
                acc_ref, ts_ref, ld_ref, ad_ref, ltsd_ref, alive_ref,
                *, ts, tx, ncs, ndc, power_min, term_eps):
    P = ts * ts
    f32 = spay_ref.dtype
    Kd = dpay_ref.shape[-1]
    px, py = _pixel_coords(ts, tx, f32)

    skip = jnp.max(skip_ref[...]) > 0     # (1,128) lane-replicated → scalar
    count_s = jnp.where(skip, jnp.max(cs_ref[...]), 0)
    count_d = jnp.where(skip, jnp.max(cd_ref[...]), 0)

    acc_ref[...] = jnp.zeros((P, 4), f32)
    ts_ref[...] = jnp.ones((P, 1), f32)
    ld_ref[...] = jnp.zeros((P, Kd), f32)
    ad_ref[...] = jnp.zeros((P, Kd), f32)
    ltsd_ref[...] = jnp.zeros((P, Kd), f32)
    alive_ref[0] = jnp.int32(1)

    _dyn_log_alphas(dpay_ref, count_d, px, py, power_min, ld_ref, ad_ref, ndc)
    dd = dpay_ref[_ROW_DEPTH:_ROW_DEPTH + 1, :]               # (1, Kd)

    for c in range(ncs):                                      # static unroll
        c0 = c * CHUNK

        @pl.when((alive_ref[0] == 1) & (c0 < count_s))
        def _():
            alpha, _, _, _, _, _, _, _ = _chunk_geometry(
                spay_ref, c0, px, py, power_min)
            ls = jnp.log1p(-alpha)
            cs = _cumsum_lanes(ls, CHUNK)
            ind, ds = _static_chunk_ind(spay_ref, c0, dd)     # (C, Kd)
            ld = ld_ref[...]
            sum_ld = jnp.sum(ld, axis=1, keepdims=True)       # (P, 1)
            # log Td(<ds_i) = Σ_j [dd_j < ds_i] ld_j = Σ ld − ld·indᵀ
            logtd = sum_ld - _dot(ld, ind, ((1,), (1,)), exact=True)  # (P, C)
            tsv = ts_ref[...]
            w = alpha * jnp.exp(cs - ls + logtd) * tsv        # (P, C)
            crgbd = spay_ref[_ROW_RGBD, c0:c0 + CHUNK]        # (4, C)
            acc_ref[...] += _dot(w, crgbd, ((1,), (1,)))
            ltsd_ref[...] += _dot(ls, ind, ((1,), (0,)), exact=True)  # (P, Kd)
            ts_new = tsv * jnp.exp(cs[:, CHUNK - 1:CHUNK])
            ts_ref[...] = ts_new
            if term_eps is not None:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                act = lane < (count_s - c0)
                dbound = jnp.max(jnp.where(act, ds, -jnp.inf))
                indb = (dd < dbound).astype(f32)              # (1, Kd)
                td_b = jnp.exp(_dot(ld, indb, ((1,), (1,)), exact=True))
                alive_ref[0] = (jnp.max(ts_new * td_b)
                                >= term_eps).astype(jnp.int32)

    @pl.when(count_d > 0)
    def _():
        ld = ld_ref[...]
        csd = _cumsum_lanes(ld, Kd)
        wd = ad_ref[...] * jnp.exp(csd - ld + ltsd_ref[...])  # (P, Kd)
        crgbd_d = dpay_ref[_ROW_RGBD, :]                      # (4, Kd)
        acc_ref[...] += _dot(wd, crgbd_d, ((1,), (1,)))

    sum_ld = jnp.sum(ld_ref[...], axis=1, keepdims=True)
    out_ref[:, 0:4] = acc_ref[...]
    out_ref[:, 4:5] = ts_ref[...] * jnp.exp(sum_ld)
    out_ref[:, 5:8] = jnp.zeros((P, 3), f32)


def _bwd_kernel(cs_ref, cd_ref, skip_ref, spay_ref, dpay_ref, ct_ref,
                fwd_ref, gs_ref, gd_ref,
                ts_ref, ld_ref, ad_ref, ltsd_ref, prefix_ref, sdyn_ref,
                bdwd_ref, applied_ref,
                *, ts, tx, ncs, ndc, power_min, term_eps):
    P = ts * ts
    f32 = spay_ref.dtype
    Kd = dpay_ref.shape[-1]
    px, py = _pixel_coords(ts, tx, f32)

    skip = jnp.max(skip_ref[...]) > 0
    count_s = jnp.where(skip, jnp.max(cs_ref[...]), 0)
    count_d = jnp.where(skip, jnp.max(cd_ref[...]), 0)

    gs_ref[...] = jnp.zeros_like(gs_ref)
    gd_ref[...] = jnp.zeros_like(gd_ref)
    ts_ref[...] = jnp.ones((P, 1), f32)
    ld_ref[...] = jnp.zeros((P, Kd), f32)
    ad_ref[...] = jnp.zeros((P, Kd), f32)
    ltsd_ref[...] = jnp.zeros((P, Kd), f32)
    sdyn_ref[...] = jnp.zeros((P, Kd), f32)
    prefix_ref[...] = jnp.zeros((P, 1), f32)
    applied_ref[0] = jnp.int32(1)        # reused as running alive in pass A

    _dyn_log_alphas(dpay_ref, count_d, px, py, power_min, ld_ref, ad_ref, ndc)
    dd = dpay_ref[_ROW_DEPTH:_ROW_DEPTH + 1, :]

    # ---- pass A: replay the forward's sequential state — accumulate
    # log Ts(≤ dd_j) over the chunks the forward actually applied, recording
    # the per-chunk applied bits for pass B (no stored carries needed).
    for c in range(ncs):
        c0 = c * CHUNK
        applied_ref[1 + c] = jnp.where(
            (applied_ref[0] == 1) & (c0 < count_s), 1, 0).astype(jnp.int32)

        @pl.when(applied_ref[1 + c] == 1)
        def _():
            alpha, _, _, _, _, _, _, _ = _chunk_geometry(
                spay_ref, c0, px, py, power_min)
            ls = jnp.log1p(-alpha)
            ind, ds = _static_chunk_ind(spay_ref, c0, dd)
            ltsd_ref[...] += _dot(ls, ind, ((1,), (0,)), exact=True)
            cs = _cumsum_lanes(ls, CHUNK)
            ts_new = ts_ref[...] * jnp.exp(cs[:, CHUNK - 1:CHUNK])
            ts_ref[...] = ts_new
            if term_eps is not None:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                act = lane < (count_s - c0)
                dbound = jnp.max(jnp.where(act, ds, -jnp.inf))
                indb = (dd < dbound).astype(f32)
                td_b = jnp.exp(_dot(ld_ref[...], indb, ((1,), (1,)), exact=True))
                applied_ref[0] = (jnp.max(ts_new * td_b)
                                  >= term_eps).astype(jnp.int32)

    ct_rgbd = ct_ref[:, 0:4]                                  # (P, 4)
    ct_tc = ct_ref[:, 4:5]
    s_tot = jnp.sum(ct_rgbd * fwd_ref[:, 0:4], axis=1, keepdims=True)
    trans_term = ct_tc * fwd_ref[:, 4:5]

    # dynamic weights / cotangent products (valid after pass A's ltsd)
    ld = ld_ref[...]
    ad = ad_ref[...]
    csd = _cumsum_lanes(ld, Kd)
    texcl_d = jnp.exp(csd - ld + ltsd_ref[...])               # (P, Kd)
    wd = ad * texcl_d
    crgbd_d = dpay_ref[_ROW_RGBD, :]
    bd = _dot(ct_rgbd, crgbd_d, ((1,), (0,)))                 # (P, Kd)
    bdwd_ref[...] = bd * wd
    sum_bdwd = jnp.sum(bdwd_ref[...], axis=1, keepdims=True)  # (P, 1)

    # ---- pass B: static gradients with union suffix sums
    ts_ref[...] = jnp.ones((P, 1), f32)
    for c in range(ncs):
        c0 = c * CHUNK

        @pl.when(applied_ref[1 + c] == 1)
        def _():
            alpha, active, expp, dx, dy, ca, cb, cc = _chunk_geometry(
                spay_ref, c0, px, py, power_min)
            om = 1.0 - alpha
            cp = _cumprod_lanes(om, CHUNK)
            ind, _ = _static_chunk_ind(spay_ref, c0, dd)
            bdwd = bdwd_ref[...]
            logtd = (jnp.sum(ld_ref[...], axis=1, keepdims=True)
                     - _dot(ld_ref[...], ind, ((1,), (1,)), exact=True))
            tsv = ts_ref[...]
            # pass B needs no static logs (unlike pass A's ltsd matmul) —
            # multiplicative exclusive prefix saves a log1p per entry
            texcl_u = (cp / om) * jnp.exp(logtd) * tsv        # w/α
            w = alpha * texcl_u
            crgbd = spay_ref[_ROW_RGBD, c0:c0 + CHUNK]
            bs = _dot(ct_rgbd, crgbd, ((1,), (0,)))           # (P, C)
            bw = bs * w
            incl = _cumsum_lanes(bw, CHUNK)
            # Σ over dynamic entries in front of static entry i
            sd_before = sum_bdwd - _dot(bdwd, ind, ((1,), (1,)), exact=True)
            suffix = s_tot - (prefix_ref[...] + incl + sd_before)
            one_m = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_CLAMP)
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
            gs_ref[_ROW_RGBD, sl] = _dot(ct_rgbd, w, ((0,), (0,)))
            gs_ref[_ROW_OP:_ROW_OP + 1, sl] = jnp.sum(
                dop_pc, axis=0, keepdims=True)

            # static cotangent mass in front of each dynamic entry
            sdyn_ref[...] += _dot(bw, ind, ((1,), (0,)), exact=True)
            prefix_ref[...] += incl[:, CHUNK - 1:CHUNK]
            ts_ref[...] = tsv * cp[:, CHUNK - 1:CHUNK]

    # ---- dynamic gradients
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


def _lane_rep(v, T):
    return jnp.broadcast_to(v.astype(jnp.int32)[:, None, None], (T, 1, 128))


def _call_fwd(spay, dpay, counts_s, counts_d, skip, ts, tx, power_min,
              interpret, term_eps):
    T, _, Ks = spay.shape
    Kd = dpay.shape[2]
    P = ts * ts
    kern = functools.partial(
        _fwd_kernel, ts=ts, tx=tx, ncs=Ks // CHUNK, ndc=Kd // CHUNK,
        power_min=power_min, term_eps=term_eps)
    rep = pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[rep, rep, rep,
                  pl.BlockSpec((None, 10, Ks), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, 10, Kd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, P, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, P, 8), spay.dtype),
        scratch_shapes=[
            pltpu.VMEM((P, 4), spay.dtype),
            pltpu.VMEM((P, 1), spay.dtype),
            pltpu.VMEM((P, Kd), spay.dtype),
            pltpu.VMEM((P, Kd), spay.dtype),
            pltpu.VMEM((P, Kd), spay.dtype),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(_lane_rep(counts_s, T), _lane_rep(counts_d, T), _lane_rep(skip, T),
      spay, dpay)


def _call_bwd(spay, dpay, counts_s, counts_d, skip, ct, fwd_out, ts, tx,
              power_min, interpret, term_eps):
    T, _, Ks = spay.shape
    Kd = dpay.shape[2]
    P = ts * ts
    ncs = Ks // CHUNK
    kern = functools.partial(
        _bwd_kernel, ts=ts, tx=tx, ncs=ncs, ndc=Kd // CHUNK,
        power_min=power_min, term_eps=term_eps)
    rep = pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[rep, rep, rep,
                  pl.BlockSpec((None, 10, Ks), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, 10, Kd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, P, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, P, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((None, 10, Ks), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 10, Kd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 10, Ks), spay.dtype),
            jax.ShapeDtypeStruct((T, 10, Kd), spay.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 1), spay.dtype),        # ts carry
            pltpu.VMEM((P, Kd), spay.dtype),       # ld
            pltpu.VMEM((P, Kd), spay.dtype),       # ad
            pltpu.VMEM((P, Kd), spay.dtype),       # ltsd
            pltpu.VMEM((P, 1), spay.dtype),        # static prefix
            pltpu.VMEM((P, Kd), spay.dtype),       # Σ bs·ws in front of dyn
            pltpu.VMEM((P, Kd), spay.dtype),       # bd·wd
            pltpu.SMEM((1 + ncs,), jnp.int32),     # alive + applied bits
        ],
        interpret=interpret,
    )(_lane_rep(counts_s, T), _lane_rep(counts_d, T), _lane_rep(skip, T),
      spay, dpay, ct, fwd_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def composite_pallas_pair(spay, dpay, counts_s, counts_d, skip, ts: int,
                          tx: int, sigma_cutoff: Optional[float],
                          interpret: bool,
                          term_eps: Optional[float] = None):
    """Interleaved composite of static (T, 10, Ks) + dynamic (T, 10, Kd)
    per-tile lists → out (T, P, 8): [rgb, depth_acc, trans, 0×3].

    Both lists follow the gather_tile_lists contract (depth-ascending,
    actives first, inactive entries opacity 0); Ks and Kd must be multiples
    of 128.  ``skip`` (T,) int32: tiles with skip == 0 emit the trivial
    empty composite and do no work, forward and backward — only valid when
    the caller discards those tiles (rasterize_with_cache's where-select
    against the static composite).  Output is identical (to fp32 rounding)
    to merging the two lists with merge_sorted_lists and compositing the
    result; see the module docstring for the factorization.
    """
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    return _call_fwd(spay, dpay, counts_s, counts_d, skip, ts, tx, pmin,
                     interpret, term_eps)


def _pair_fwd(spay, dpay, counts_s, counts_d, skip, ts, tx, sigma_cutoff,
              interpret, term_eps):
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    out = _call_fwd(spay, dpay, counts_s, counts_d, skip, ts, tx, pmin,
                    interpret, term_eps)
    return out, (spay, dpay, counts_s, counts_d, skip, out)


def _pair_bwd(ts, tx, sigma_cutoff, interpret, term_eps, res, ct):
    import numpy as _np

    spay, dpay, counts_s, counts_d, skip, out = res
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    gs, gd = _call_bwd(spay, dpay, counts_s, counts_d, skip, ct, out, ts, tx,
                       pmin, interpret, term_eps)
    zero = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
    return gs, gd, zero(counts_s), zero(counts_d), zero(skip)


composite_pallas_pair.defvjp(_pair_fwd, _pair_bwd)
