"""Pallas TPU kernel for per-tile front-to-back alpha compositing.

The XLA scan compositing (ops/rasterize_tiles.composite_tiles) is
memory-bound: every chunk materializes (T, P, chunk) intermediates in HBM
for alphas/weights, and the cumprod lowers to multiple passes.  This kernel
keeps the whole per-tile working set in VMEM: one HBM read of the gathered
per-tile lists, one packed write of the per-tile outputs.

Layout (TPU tiling-friendly):
- input  ``payload`` (T, 10, K): field-major rows
  [x, y, conic a, conic b, conic c, r, g, b, depth, opacity] with the K
  list entries on lanes (K % 128 == 0) — colors and depth contiguous so
  accumulation is ONE (P,C)·(4,C)ᵀ MXU contraction;
- output ``out`` (T, P, 8): per-pixel [rgb×3, depth_acc, transmittance,
  pad×3] with P = tile_size² on sublanes;
- output ``carries`` (T, P, NC): chunk-start transmittances — the
  checkpoints the backward kernel restarts from (gsplat's
  recompute-in-backward, at chunk granularity).

In-kernel, each 128-entry chunk computes alphas as (P, 128) VPU blocks, the
within-chunk cumulative transmittance as a log-space Hillis-Steele scan
over lanes (7 shifted adds), and color+depth accumulation as one MXU
contraction into a VMEM scratch accumulator (Mosaic supports ref-accumulate
but not loop-carried dot accumulators).  The chunk loop is Python-unrolled:
NC is small and static, and Mosaic needs static lane offsets for the narrow
carry stores.  The backward kernel re-derives the gsplat gradient formulas
chunk-forward using suffix sums — no atomics, no scatters anywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sim_a_splat_tpu.ops.rasterize_reference import ALPHA_CLAMP, ALPHA_MIN

CHUNK = 128   # list entries per in-kernel chunk (= one lane group)

# payload row indices
_ROW_X, _ROW_Y = 0, 1
_ROW_CA, _ROW_CB, _ROW_CC = 2, 3, 4
_ROW_RGBD = slice(5, 9)     # r, g, b, depth
_ROW_OP = 9


def _cumsum_lanes(x: jnp.ndarray, C: int) -> jnp.ndarray:
    """Inclusive prefix sum along the last (lane) axis via Hillis-Steele."""
    s = 1
    P = x.shape[0]
    while s < C:
        shifted = jnp.concatenate(
            [jnp.zeros((P, s), x.dtype), x[:, : C - s]], axis=1)
        x = x + shifted
        s *= 2
    return x


def _cumprod_lanes(x: jnp.ndarray, C: int) -> jnp.ndarray:
    """Inclusive prefix PRODUCT along lanes (Hillis-Steele with ones
    shifted in).  Replaces the log-space cumsum + exp pair wherever the
    cross-list indicator matmuls don't force log space: a 128-term fp32
    product of (1−α) terms underflows only past T≈1e-38, far below the
    1e-4 early-termination threshold, and saves two transcendentals
    (log1p + exp) per list entry — the VPU hot spot of the compositing
    kernels."""
    s = 1
    P = x.shape[0]
    while s < C:
        shifted = jnp.concatenate(
            [jnp.ones((P, s), x.dtype), x[:, : C - s]], axis=1)
        x = x * shifted
        s *= 2
    return x


def _chunk_geometry(payload_ref, c0, px, py, power_min):
    """Recompute alphas etc for one chunk: returns (P, C) blocks."""
    C = CHUNK
    gx = payload_ref[_ROW_X:_ROW_X + 1, c0:c0 + C]         # (1, C)
    gy = payload_ref[_ROW_Y:_ROW_Y + 1, c0:c0 + C]
    ca = payload_ref[_ROW_CA:_ROW_CA + 1, c0:c0 + C]
    cb = payload_ref[_ROW_CB:_ROW_CB + 1, c0:c0 + C]
    cc = payload_ref[_ROW_CC:_ROW_CC + 1, c0:c0 + C]
    op = payload_ref[_ROW_OP:_ROW_OP + 1, c0:c0 + C]
    dx = px - gx                                           # (P, C)
    dy = py - gy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = jnp.exp(jnp.minimum(power, 0.0))
    raw = op * expp
    alpha = jnp.minimum(raw, ALPHA_CLAMP)
    keep = alpha >= ALPHA_MIN
    if power_min is not None:
        keep &= power >= power_min
    alpha = jnp.where(keep, alpha, 0.0)
    active = keep & (raw < ALPHA_CLAMP)                    # clamp kills grad
    return alpha, active, expp, dx, dy, ca, cb, cc


def _pixel_coords(ts: int, tx: int, dtype):
    i = pl.program_id(0)
    ox = ((i % tx) * ts).astype(dtype)
    oy = ((i // tx) * ts).astype(dtype)
    P = ts * ts
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (pidx % ts).astype(dtype) + 0.5 + ox
    py = (pidx // ts).astype(dtype) + 0.5 + oy
    return px, py


def _fwd_kernel(count_ref, skip_ref, payload_ref, out_ref, carry_ref,
                acc_ref, tc_ref, alive_ref, *, ts, tx, nc, power_min,
                term_eps):
    P = ts * ts
    f32 = payload_ref.dtype
    px, py = _pixel_coords(ts, tx, f32)

    count = jnp.max(count_ref[...])      # (1, 128) replicated lanes → scalar
    # whole-tile skip (cached-render path: tiles untouched by dynamic
    # gaussians reuse the once-per-step static composite — the caller
    # where-selects, so this tile's output is discarded; emit the trivial
    # empty composite and do no work)
    count = jnp.where(jnp.max(skip_ref[...]) > 0, count, 0)
    acc_ref[...] = jnp.zeros((P, 4), f32)
    tc_ref[...] = jnp.ones((P, 1), f32)
    alive_ref[0] = jnp.int32(1)
    for c in range(nc):                                    # static unroll
        carry_ref[:, c:c + 1] = tc_ref[...]

        # two scalar skip conditions per chunk: (a) early termination
        # (gsplat's T < eps stop) once every pixel of the tile is opaque,
        # (b) count cutoff — entries are actives-first per tile, so chunks
        # past the tile's active count are all zero-opacity padding
        @pl.when((alive_ref[0] == 1) & (c * CHUNK < count))
        def _():
            c0 = c * CHUNK
            alpha, _, _, _, _, _, _, _ = _chunk_geometry(
                payload_ref, c0, px, py, power_min)
            om = 1.0 - alpha                               # ≥ 1 − ALPHA_CLAMP
            cp = _cumprod_lanes(om, CHUNK)                 # (P, C)
            tc = tc_ref[...]
            w = alpha * (cp / om) * tc                     # excl-prefix × T
            crgbd = payload_ref[_ROW_RGBD, c0:c0 + CHUNK]  # (4, C)
            acc_ref[...] += jax.lax.dot_general(
                w, crgbd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            tc_new = tc * cp[:, CHUNK - 1:CHUNK]
            tc_ref[...] = tc_new
            if term_eps is not None:
                alive_ref[0] = (jnp.max(tc_new) >= term_eps).astype(jnp.int32)

    out_ref[:, 0:4] = acc_ref[...]
    out_ref[:, 4:5] = tc_ref[...]
    out_ref[:, 5:8] = jnp.zeros((P, 3), f32)


def _bwd_kernel(count_ref, skip_ref, payload_ref, ct_ref, fwd_ref, carry_ref,
                grad_ref, prefix_ref, alive_ref, *, ts, tx, nc, power_min,
                term_eps):
    P = ts * ts
    f32 = payload_ref.dtype
    px, py = _pixel_coords(ts, tx, f32)
    count = jnp.max(count_ref[...])      # (1, 128) replicated lanes → scalar
    # skipped tiles received zero cotangents (the caller's where-select
    # routed them to the static composite) — zero grads, no work
    count = jnp.where(jnp.max(skip_ref[...]) > 0, count, 0)

    ct_rgbd = ct_ref[:, 0:4]                               # (P, 4)
    ct_tc = ct_ref[:, 4:5]                                 # (P, 1)
    t_n = fwd_ref[:, 4:5]
    # Σ_j B_j w_j over ALL entries (suffix-sum anchor) = cotangent-weighted
    # totals of the forward outputs
    s_tot = jnp.sum(ct_rgbd * fwd_ref[:, 0:4], axis=1, keepdims=True)
    trans_term = ct_tc * t_n

    grad_ref[...] = jnp.zeros_like(grad_ref)
    prefix_ref[...] = jnp.zeros((P, 1), f32)
    alive_ref[0] = jnp.int32(1)
    for c in range(nc):                                    # static unroll
        # chunks the terminated forward never applied have zero gradient
        # (grad_ref pre-zeroed); replicate the forward's alive predicate
        # from the stored chunk-start transmittances
        if term_eps is not None and c > 0:
            alive_ref[0] = jnp.minimum(
                alive_ref[0],
                (jnp.max(carry_ref[:, c:c + 1]) >= term_eps).astype(jnp.int32))

        @pl.when((alive_ref[0] == 1) & (c * CHUNK < count))
        def _():
            c0 = c * CHUNK
            tc = carry_ref[:, c:c + 1]                     # (P, 1)
            alpha, active, expp, dx, dy, ca, cb, cc = _chunk_geometry(
                payload_ref, c0, px, py, power_min)
            om = 1.0 - alpha
            cp = _cumprod_lanes(om, CHUNK)
            texcl_tc = (cp / om) * tc                      # w/α (safe at α=0)
            w = alpha * texcl_tc
            crgbd = payload_ref[_ROW_RGBD, c0:c0 + CHUNK]  # (4, C)

            b = jax.lax.dot_general(                       # (P, C)
                ct_rgbd, crgbd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            bw = b * w
            incl = _cumsum_lanes(bw, CHUNK)
            prefix = prefix_ref[...]
            suffix = s_tot - (prefix + incl)               # Σ_{j>k}
            one_m = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_CLAMP)
            dalpha = b * texcl_tc - (suffix + trans_term) / one_m

            dop_pc = dalpha * expp * active
            dpower = dalpha * alpha * active
            ddx = dpower * (-(ca * dx + cb * dy))
            ddy = dpower * (-(cc * dy + cb * dx))

            sl = slice(c0, c0 + CHUNK)
            grad_ref[_ROW_X:_ROW_X + 1, sl] = -jnp.sum(
                ddx, axis=0, keepdims=True)
            grad_ref[_ROW_Y:_ROW_Y + 1, sl] = -jnp.sum(
                ddy, axis=0, keepdims=True)
            grad_ref[_ROW_CA:_ROW_CA + 1, sl] = jnp.sum(
                dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
            grad_ref[_ROW_CB:_ROW_CB + 1, sl] = jnp.sum(
                dpower * (-dx * dy), axis=0, keepdims=True)
            grad_ref[_ROW_CC:_ROW_CC + 1, sl] = jnp.sum(
                dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
            grad_ref[_ROW_RGBD, sl] = jax.lax.dot_general(  # (4, C)
                ct_rgbd, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            grad_ref[_ROW_OP:_ROW_OP + 1, sl] = jnp.sum(
                dop_pc, axis=0, keepdims=True)
            prefix_ref[...] = prefix + incl[:, CHUNK - 1:CHUNK]


def _call_fwd(payload, counts, skip, ts, tx, nc, power_min, interpret,
              term_eps):
    T = payload.shape[0]
    P = ts * ts
    K = payload.shape[2]
    # lane-replicated (T, 1, 128) — Mosaic has no scalar SMEM blocks, so the
    # per-tile count rides VMEM lanes and is reduced to an SREG in-kernel
    counts = jnp.broadcast_to(counts[:, None, None], (T, 1, 128))
    skip = jnp.broadcast_to(skip[:, None, None], (T, 1, 128))
    kern = functools.partial(_fwd_kernel, ts=ts, tx=tx, nc=nc,
                             power_min=power_min, term_eps=term_eps)
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, 10, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((None, P, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, nc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, P, 8), payload.dtype),
            jax.ShapeDtypeStruct((T, P, nc), payload.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 4), payload.dtype),
            pltpu.VMEM((P, 1), payload.dtype),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(counts, skip, payload)


def _call_bwd(payload, counts, skip, ct_out, fwd_out, carries, ts, tx, nc,
              power_min, interpret, term_eps):
    T, _, K = payload.shape
    P = ts * ts
    counts = jnp.broadcast_to(counts[:, None, None], (T, 1, 128))
    skip = jnp.broadcast_to(skip[:, None, None], (T, 1, 128))
    kern = functools.partial(_bwd_kernel, ts=ts, tx=tx, nc=nc,
                             power_min=power_min, term_eps=term_eps)
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 10, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, nc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 10, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 10, K), payload.dtype),
        scratch_shapes=[
            pltpu.VMEM((P, 1), payload.dtype),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(counts, skip, payload, ct_out, fwd_out, carries)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def composite_pallas(payload, counts, skip, ts: int, tx: int,
                     sigma_cutoff: Optional[float], interpret: bool,
                     term_eps: Optional[float] = None):
    """payload (T, 10, K) → out (T, P, 8): [rgb, depth_acc, trans, 0...].

    K must be a multiple of 128; P = ts².  Entries must be depth-sorted per
    tile, actives first, with inactive entries carrying opacity 0 (the
    gather_tile_lists contract); ``counts`` (T,) int32 active entries per
    tile — chunks past the count are skipped entirely.  ``skip`` (T,)
    int32: tiles with skip == 0 are skipped outright, forward AND backward,
    and emit the trivial empty composite (rgb 0, trans 1) — only valid when
    the caller discards those tiles' outputs (rasterize_with_cache's
    where-select against the static composite).  Pass ``counts`` (or ones)
    to disable.  Payload rows: x, y, conic(a,b,c), r, g, b, depth, opacity.
    ``term_eps`` enables per-tile early termination once every pixel's
    transmittance is below it (gsplat semantics; error bound = term_eps).
    """
    nc = payload.shape[2] // CHUNK
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    out, _ = _call_fwd(payload, counts, skip, ts, tx, nc, pmin, interpret,
                       term_eps)
    return out


def _composite_fwd(payload, counts, skip, ts, tx, sigma_cutoff, interpret,
                   term_eps):
    nc = payload.shape[2] // CHUNK
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    out, carries = _call_fwd(payload, counts, skip, ts, tx, nc, pmin,
                             interpret, term_eps)
    return out, (payload, counts, skip, out, carries)


def _composite_bwd(ts, tx, sigma_cutoff, interpret, term_eps, res, ct):
    import numpy as _np

    payload, counts, skip, out, carries = res
    nc = payload.shape[2] // CHUNK
    pmin = None if sigma_cutoff is None else -0.5 * sigma_cutoff**2
    grad = _call_bwd(payload, counts, skip, ct, out, carries, ts, tx, nc,
                     pmin, interpret, term_eps)
    return (grad, _np.zeros(counts.shape, jax.dtypes.float0),
            _np.zeros(skip.shape, jax.dtypes.float0))


composite_pallas.defvjp(_composite_fwd, _composite_bwd)
