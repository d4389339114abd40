"""Round-4 profile of the selected-tile cached env step (the bench primary)
with speed-of-light (roofline) accounting.

Times each stage of ``_make_step_cached_batch`` in isolation on the real
device, then computes an analytic FLOP/byte model for the three heavy
stages (projection, binning sort, sel compositing kernel) from the
CONCRETE tile counts of the bench scene, and reports achieved vs peak —
so "is the remaining ms compute- or memory-bound, and how far from the
roof" has a recorded answer (VERDICT r3 missing #4).

Peaks used (TPU v5e, public numbers): 197 TFLOP/s bf16 MXU, ~49 TFLOP/s
f32-precision MXU (HIGHEST ≈ 6 bf16 passes ⇒ ~33), 819 GB/s HBM.

Usage: python benchmarks/profile_sel.py   [env overrides as bench.py]
Writes stage table to stderr, one JSON to stdout.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_BF16 = 197e12
PEAK_F32 = 49e12          # one-pass bf16 ("default") f32 matmul
PEAK_F32_EXACT = PEAK_BF16 / 6.0   # HIGHEST = 6-pass emulation
PEAK_HBM = 819e9
PEAK_VPU = 3.9e12         # ~8×128 lanes × 4 ALUs × 940 MHz


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             os.pardir, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from __graft_entry__ import _build_scene, _make_step_cached_batch
    from sim_a_splat_tpu.ops import Camera, SE3, quaternion as quat
    from sim_a_splat_tpu.ops import sh as sh_ops
    from sim_a_splat_tpu.ops.projection import project_raw, view_directions
    from sim_a_splat_tpu.ops.pallas_composite import CHUNK
    from sim_a_splat_tpu.ops.pallas_composite_sel import composite_pair_sel
    from sim_a_splat_tpu.ops.rasterize_cached import (
        _gather_tile_lists_sel, _pack_payload, build_static_composite,
        build_tile_cache_raw, select_touched_tiles,
    )
    from sim_a_splat_tpu.ops.rasterize_tiles import (
        RasterConfig, _bin_gaussians,
    )
    from sim_a_splat_tpu.physics import PushTParams, pusht
    from sim_a_splat_tpu.utils.profiling import time_jitted

    B = int(os.environ.get("BENCH_B", "32"))
    N = int(os.environ.get("BENCH_N", "100000"))
    RES = int(os.environ.get("BENCH_RES", "256"))
    cap = int(os.environ.get("BENCH_TILE_CAP", "1024"))
    dyn_cap = int(os.environ.get("BENCH_DYN_CAP", "128"))
    sel_tiles = int(os.environ.get("BENCH_SEL_TILES", "96"))
    dyn_m = int(os.environ.get("BENCH_DYN_M", "9"))
    term = float(os.environ.get("BENCH_TERM", "1e-4"))
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    dev = jax.devices()[0]
    log(f"profile_sel: device={dev.platform}/{dev.device_kind} B={B} N={N} "
        f"res={RES} cap={cap} dyn_cap={dyn_cap} sel={sel_tiles} "
        f"backend={backend}")

    n_block = max(N // 20, 100)
    n_agent = max(N // 50, 50)
    graph = _build_scene(n_bg=N - n_block - n_agent, n_block=n_block,
                         n_agent=n_agent, seed=0, sh_degree=3)
    raster = RasterConfig(tile_size=16, tile_capacity=cap,
                          max_tiles_per_gaussian=16, chunk=128,
                          sigma_cutoff=3.0, backend=backend,
                          term_eps=term if term > 0 else None,
                          buckets=((4, 0.90), (6, 0.06), (9, 0.04)))

    P = PushTParams()
    cam = Camera.from_fov(
        SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([149.0, 256.0, -450.0])),
        1.05, RES, RES)
    ts = raster.tile_size
    tx = -(-RES // ts)
    ty = -(-RES // ts)
    T = tx * ty
    Pp = ts * ts

    ids_np = np.asarray(graph.link_ids)
    stat_idx = jnp.asarray(np.where(ids_np == 0)[0], jnp.int32)
    dyn_idx = jnp.asarray(np.where(ids_np > 0)[0], jnp.int32)
    dyn_ids = jnp.asarray(ids_np[ids_np > 0], jnp.int32)
    scene = graph.scene

    keys = jax.random.split(jax.random.key(0), B)
    states = jax.jit(jax.vmap(lambda k: pusht.reset(P, k)))(keys)
    actions = jnp.tile(jnp.asarray([150.0, 250.0], jnp.float32), (B, 1))
    jax.block_until_ready(states)
    log("setup done")

    res = {}
    only = os.environ.get("PROFILE_ONLY", "")

    def bench(name, fn, *args):
        if only and not any(s in name for s in only.split(",")):
            log(f"[{name}] untimed (PROFILE_ONLY)")
            return jax.jit(fn)(*args)
        log(f"[{name}] compiling...")
        s, out = time_jitted(fn, *args, iters=iters, warmup=2, name=None)
        res[name] = round(s * 1e3, 3)
        log(f"{name:24s} {s * 1e3:9.3f} ms")
        return out

    # ---- stages -------------------------------------------------------
    def physics_fn(states, actions):
        return jax.vmap(lambda s, a: pusht.control_step(P, s, a))(
            states, actions)

    new_states = bench("physics", physics_fn, states, actions)

    dyn_cfg = raster._replace(tile_capacity=dyn_cap,
                              max_tiles_per_gaussian=dyn_m)

    def pose2d(xy, angle):
        return (quat.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), angle),
                jnp.concatenate([xy, jnp.zeros(1)]))

    dyn = scene.select(dyn_idx)

    def pose_one(state):
        qb, tb = pose2d(state.block_pos, state.block_angle)
        qa, ta = pose2d(state.agent_pos, jnp.zeros(()))
        body_poses = SE3(jnp.stack([jnp.asarray([1.0, 0, 0, 0]), qb, qa]),
                         jnp.stack([jnp.zeros(3), tb, ta]))
        rel = body_poses.compose(graph.rest_inv)
        q_g = rel.q[dyn_ids]
        t_g = rel.t[dyn_ids]
        means = quat.rotate(q_g, dyn.means) + t_g
        quats = quat.multiply(q_g, dyn.quats)
        dirs = view_directions(means, cam)
        cols = sh_ops.eval_sh_color_split(dyn.sh_dc, dyn.sh_rest, dirs,
                                          scene.sh_degree)
        return means, quats, cols

    def pose_fn(states):
        return jax.vmap(pose_one)(states)

    d_means, d_quats, d_cols = bench("pose_sh_dyn", pose_fn, new_states)
    Bv = d_means.shape[0]
    d_ls = jnp.broadcast_to(dyn.log_scales, (Bv,) + dyn.log_scales.shape)
    d_op = jnp.broadcast_to(dyn.opacities(), (Bv,) + dyn.opacities().shape)

    def bin_sel_fn(means, quats, ls, cols, ops):
        def one(m, q, l, c, o):
            proj = project_raw(m, q, l, cam)
            (_, sorted_gidx, starts, counts, trunc) = _bin_gaussians(
                proj, dyn_cfg, tx, ty)
            ids, c0, n_over = select_touched_tiles(counts, sel_tiles, T)
            dpay, c_sel = _gather_tile_lists_sel(
                proj, c, o, sorted_gidx, starts, counts, ids, dyn_cap)
            return dpay, ids, c_sel, counts
        return jax.vmap(one)(means, quats, ls, cols, ops)

    dpay, sel_ids, counts_d, dcounts = bench(
        "projbin_sel_dyn", bin_sel_fn, d_means, d_quats, d_ls, d_cols, d_op)

    # --- prepare sub-stages (static set, once per train step) ---------
    st_scene = scene.select(stat_idx)

    def sh_static_fn(st):
        dirs = view_directions(st.means, cam)
        return sh_ops.eval_sh_color_split(st.sh_dc, st.sh_rest, dirs,
                                          scene.sh_degree)

    st_colors = bench("prep/sh_static", sh_static_fn, st_scene)

    def proj_static_fn(st):
        return project_raw(st.means, st.quats, st.log_scales, cam)

    st_proj = bench("prep/project_static", proj_static_fn, st_scene)

    def bin_static_fn(proj):
        return _bin_gaussians(proj, raster, tx, ty)

    _sorted = bench("prep/bin_static", bin_static_fn, st_proj)

    def gather_static_fn(st, colors):
        from sim_a_splat_tpu.ops.rasterize_tiles import gather_tile_lists
        proj = project_raw(st.means, st.quats, st.log_scales, cam)
        return gather_tile_lists(proj, colors, st.opacities(), raster,
                                 tx, ty)

    bench("prep/projbin+gather", gather_static_fn, st_scene, st_colors)

    def prepare_fn(scene):
        st = scene.select(stat_idx)
        dirs = view_directions(st.means, cam)
        colors = sh_ops.eval_sh_color_split(st.sh_dc, st.sh_rest, dirs,
                                            scene.sh_degree)
        cache = build_tile_cache_raw(st.means, st.quats, st.log_scales,
                                     colors, st.opacities(), cam, raster)
        return cache, build_static_composite(cache, cam, raster)

    cache, scomp = bench("prepare_sh3", prepare_fn, scene)

    def prepare_fb_fn(scene):
        def loss(sc):
            c, sO = prepare_fn(sc)
            return (jnp.mean(c.gcol ** 2) + jnp.mean(c.gxy ** 2)
                    + jnp.mean(sO[0] ** 2))
        return jax.value_and_grad(loss)(scene)

    bench("prepare_sh3_fb", prepare_fb_fn, scene)

    # concrete counts for the roofline model
    counts_s_np = np.asarray(cache.counts)
    sel_ids_np = np.asarray(sel_ids)
    counts_d_np = np.asarray(counts_d)
    dcounts_np = np.asarray(dcounts)
    log(f"  static counts: mean={counts_s_np.mean():.0f} "
        f"max={counts_s_np.max()} p90={np.percentile(counts_s_np, 90):.0f}")
    log(f"  touched tiles/env: mean="
        f"{(dcounts_np > 0).sum(1).mean():.1f} max={(dcounts_np > 0).sum(1).max()}")

    spay_pad = jnp.concatenate(
        [_pack_payload(cache), jnp.zeros((1, 10, cap), jnp.float32)], axis=0)
    counts_s_pad = jnp.concatenate(
        [cache.counts.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])

    def sel_f(spay_pad, dpay):
        return composite_pair_sel(
            spay_pad, dpay, sel_ids, counts_s_pad, counts_d, ts, tx,
            raster.sigma_cutoff, backend == "pallas_interpret",
            raster.term_eps, raster.sel_exact_fwd, raster.sel_exact_bwd)

    bench("sel_kernel_f", sel_f, spay_pad, dpay)

    def sel_fb(spay_pad, dpay):
        def loss(sp, dp):
            out = composite_pair_sel(
                sp, dp, sel_ids, counts_s_pad, counts_d, ts, tx,
                raster.sigma_cutoff, backend == "pallas_interpret",
                raster.term_eps, raster.sel_exact_fwd, raster.sel_exact_bwd)
            return jnp.mean(out[:, :T, 0:3, :] ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1))(spay_pad, dpay)

    bench("sel_kernel_fb", sel_fb, spay_pad, dpay)

    # ---- full step ----------------------------------------------------
    prepare, step_b, _ = _make_step_cached_batch(
        graph, RES, RES, raster, dyn_capacity=dyn_cap, sel_tiles=sel_tiles,
        dyn_max_tiles=dyn_m)

    def loss_of(scene, states, actions):
        c = prepare(scene)
        ns, imgs, _ = step_b(c, scene, states, actions)
        return jnp.mean(imgs ** 2), ns

    bench("step_fwd", lambda sc, st, a: loss_of(sc, st, a),
          scene, states, actions)

    def step_fwdbwd(sc, st, a):
        (loss, ns), grads = jax.value_and_grad(
            lambda s_: loss_of(s_, st, a), has_aux=True)(sc)
        return ns, loss, grads

    bench("step_fwdbwd", step_fwdbwd, scene, states, actions)

    # ---- roofline model ----------------------------------------------
    C = CHUNK
    Kd = dyn_cap
    Ks = cap
    # chunks actually visited: capped at the kernel's unrolled Ks/C (counts
    # beyond the static capacity are truncated at cache build), and term_eps
    # early-stop can cut further (not modeled ⇒ roof is an upper bound)
    ncs_eff = np.minimum(np.ceil(counts_s_np / C), Ks // C)
    # per selected real slot (b, i): chunks gated by count_s of its tile
    real = sel_ids_np < T
    chunks_per_slot = np.where(real, ncs_eff[np.minimum(sel_ids_np, T - 1)], 0)
    n_slots = int(real.sum())
    tot_chunks = float(chunks_per_slot.sum())

    # forward MXU: per chunk 2 big contractions (P,Kd)x(Kd,C) & (P,C)x(C,Kd)
    # at HIGHEST (6-pass) when sel_exact_fwd, + small color/term dots
    big = 2 * Pp * Kd * C * 2                   # FLOPs, 2 matmuls
    small = 2 * Pp * C * 4 + 2 * Pp * Kd * 1
    mxu_f = tot_chunks * (big + small)
    exact_f = raster.sel_exact_fwd
    # VPU: alpha eval ~30 flops/entry/pixel over visited chunks + dyn
    vpu_f = tot_chunks * C * Pp * 30 + n_slots * Kd * Pp * 35
    # HBM: per slot one static block + dyn block in, one out block
    hbm_f = (n_slots * (10 * Ks + 10 * Kd + Pp * 8) * 4)

    # backward: pass A ≈ fwd MXU, pass B ≈ 2 big dots + geometry again,
    # dyn pass small ⇒ ~2.5× forward MXU at exact_bwd else default
    mxu_b = 2.5 * mxu_f
    hbm_b = n_slots * (10 * Ks + 10 * Kd + 2 * Pp * 8
                       + 10 * Ks + 10 * Kd) * 4
    # one-hot scatter: (B·TT, T+1)x(B·TT, 10Ks) at HIGHEST
    scat = 2 * (sel_ids_np.size) * (T + 1) * 10 * Ks

    def sol(name, t_ms, mxu, vpu, hbm, exact):
        if t_ms is None:
            return
        t = t_ms / 1e3
        peak = PEAK_F32_EXACT if exact else PEAK_F32
        bound = max(mxu / peak, vpu / PEAK_VPU, hbm / PEAK_HBM)
        res[f"sol_{name}"] = dict(
            mxu_tflop=round(mxu / 1e12, 3), vpu_tflop=round(vpu / 1e12, 3),
            hbm_mb=round(hbm / 1e6, 1),
            mxu_util=round(mxu / peak / t, 3),
            vpu_util=round(vpu / PEAK_VPU / t, 3),
            bw_util=round(hbm / PEAK_HBM / t, 3),
            sol_ms=round(bound * 1e3, 3),
            sol_frac=round(bound / t, 3))
        log(f"SOL {name:14s} t={t_ms:8.2f} ms  roof={bound * 1e3:7.2f} ms "
            f"({100 * bound / t:5.1f}% of SoL)  mxu={100 * mxu / peak / t:5.1f}% "
            f"vpu={100 * vpu / PEAK_VPU / t:5.1f}% bw={100 * hbm / PEAK_HBM / t:5.1f}%")

    sol("sel_f", res.get("sel_kernel_f"), mxu_f, vpu_f, hbm_f, exact_f)
    if "sel_kernel_fb" in res:
        sol("sel_fb", res["sel_kernel_fb"] - res.get("sel_kernel_f", 0),
            mxu_b + scat, 1.6 * vpu_f, hbm_b, raster.sel_exact_bwd)

    # projection + binning models (prepare, per train step)
    Ns = int(stat_idx.shape[0])
    proj_flops = Ns * 250.0
    proj_bytes = Ns * (14 + 8) * 4
    # sh3 eval: 16 coeffs × 3 ch × ~4 flops + basis ~60
    sh_flops = Ns * (16 * 3 * 4 + 60)
    sh_bytes = Ns * (16 * 3 + 3 + 3) * 4
    # binning: bucketed E elements, ~log2(E) bitonic-ish passes, 8B ops
    bucket_E = Ns * sum(
        f * m for m, f in (raster.buckets or ((raster.max_tiles_per_gaussian,
                                               1.0),)))
    sort_bytes = bucket_E * 8 * np.ceil(np.log2(max(bucket_E, 2))) * 2
    gather_bytes = T * Ks * 10 * 4 * 2
    res["sol_prepare"] = dict(
        proj_tflop=round(proj_flops / 1e12, 4),
        sh_tflop=round(sh_flops / 1e12, 4),
        sort_model_mb=round(sort_bytes / 1e6, 1),
        gather_mb=round(gather_bytes / 1e6, 1),
        hbm_floor_ms=round((proj_bytes + sh_bytes + sort_bytes
                            + gather_bytes) / PEAK_HBM * 1e3, 3))
    log(f"SOL prepare: hbm floor ≈ {res['sol_prepare']['hbm_floor_ms']} ms "
        f"(sort model {res['sol_prepare']['sort_model_mb']} MB)")

    res["_config"] = dict(B=B, N=N, RES=RES, cap=cap, dyn_cap=dyn_cap,
                          sel_tiles=sel_tiles, backend=backend,
                          n_sel_slots=n_slots, tot_chunks=tot_chunks,
                          ms_per_frame_fwdbwd=(res.get("step_fwdbwd", 0)
                                               / max(B, 1)))
    if "step_fwdbwd" in res:
        log(f"\nfull fwd+bwd: {res['step_fwdbwd']:.2f} ms/batch = "
            f"{res['step_fwdbwd'] / B:.2f} ms/frame "
            f"({1e3 * B / res['step_fwdbwd']:.1f} f/s)")
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
