"""Benchmark: pushT splat env observation throughput, fwd+bwd, per chip.

Primary metric (BASELINE.md north star): frames/s/chip rendering 256×256
observations for a batch of parallel pushT splat envs — full pipeline per
frame: physics control step (10 substeps) → scene-graph posing → 3DGS tile
rasterization → pixel-loss backward to all gaussian parameters.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
reported against the north-star target density of 10_000 frames/s on a
v5e-16 ⇒ 625 frames/s/chip.

Prints exactly ONE JSON line on stdout: the primary metric plus a
``variants`` dict carrying every representative config that fit in the
time budget (moving camera, 2-camera product wrapper, DC-only, and
reference-scene-scale N).  Progress goes to stderr.

Budget design (round 4): scene construction is pure numpy + one
device_put (seconds, not minutes), compiled executables persist in
``.jax_cache`` across runs, and variants run highest-priority-first with
per-variant budget checks — so a cold 420 s run records the primary + the
two round-3-unproven claims (product, moving) before anything optional.

Env overrides: BENCH_B (envs), BENCH_N (gaussians), BENCH_RES, BENCH_ITERS,
BENCH_VARIANTS=0, BENCH_BUDGET_S, BENCH_SCALES=0 (skip the N-sweep).
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compile cache: the dominant cost of a cold bench run is
    # remote XLA compilation (~40-70 s per config); cached executables make
    # a warm run fit every variant inside the driver's budget
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception as e:   # cache is an optimization, never a failure
        log(f"compile cache unavailable: {e!r}")

    import jax.numpy as jnp

    from __graft_entry__ import (
        _build_scene, _make_step, _make_step_cached, _make_step_cached_batch,
        _make_step_moving, _make_step_moving_cached,
    )
    from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
    from sim_a_splat_tpu.physics import pusht

    # B=128 from the round-4 sweep (benchmarks/sweep_r04.py, PROFILE.md):
    # with sel_tiles tight the per-step static prepare amortizes further
    # and HBM stays in budget after the channel-major layout fix —
    # 32→546.8, 64→589.0, 96→637.6, 128→686.8 f/s on chip (160/192 regress)
    B = int(os.environ.get("BENCH_B", "128"))
    N = int(os.environ.get("BENCH_N", "100000"))
    RES = int(os.environ.get("BENCH_RES", "256"))
    # 20 iters: at ~170 ms/iter the timed window is ~3.4 s — short windows
    # were measured 25% off run-to-run from tunnel dispatch jitter
    ITERS = int(os.environ.get("BENCH_ITERS", "20"))
    use_cache = os.environ.get("BENCH_CACHE", "1") != "0"
    fwd_only = os.environ.get("BENCH_FWDONLY", "0") != "0"
    variants = os.environ.get("BENCH_VARIANTS", "1") != "0"
    scales = os.environ.get("BENCH_SCALES", "1") != "0"
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "420"))
    t_start = time.time()

    def left():
        return budget_s - (time.time() - t_start)

    dev = jax.devices()[0]
    log(f"bench: device={dev.platform}/{dev.device_kind} B={B} N={N} "
        f"res={RES} iters={ITERS} cache={use_cache} fwd_only={fwd_only}")

    backend = os.environ.get(
        "BENCH_BACKEND",
        "pallas" if dev.platform in ("tpu", "axon") else "xla")
    cap = int(os.environ.get("BENCH_TILE_CAP", "1024"))
    term = float(os.environ.get("BENCH_TERM", "1e-4"))  # gsplat's stop eps
    raster = RasterConfig(tile_size=16, tile_capacity=cap,
                          max_tiles_per_gaussian=16, chunk=128,
                          sigma_cutoff=3.0, backend=backend,
                          term_eps=term if term > 0 else None,
                          # footprint-bucketed binning: measured nt
                          # distribution of the bench scene is p50=4,
                          # p99=6, max=9 — the top-4% 9-slot bucket covers
                          # every gaussian with nt>6 (truncation-free, r3)
                          buckets=((4, 0.90), (6, 0.06), (9, 0.04)))

    dyn_cap = int(os.environ.get("BENCH_DYN_CAP", "128"))
    dyn_m = int(os.environ.get("BENCH_DYN_M", "9"))
    skip = os.environ.get("BENCH_SKIP", "1") != "0"
    # selected-tile batched kernel (ops/pallas_composite_sel): composite only
    # the tiles the dynamic gaussians touch, via a scalar-prefetched (B, TT)
    # grid.  sel_tiles bounds touched tiles per env; the kernel is grid-
    # overhead-bound (~3 µs/step incl. pad slots), so a tight bound is the
    # single biggest lever: 96→48→40→36 took the primary 428→506→547→562
    # f/s at B=32 (round-4 sweep).  The bench scene touches ≤33 tiles/env;
    # the n_drop output (logged at compile) proves zero overflow — loss is
    # bit-identical to sel_tiles=96 at every B measured.
    sel_tiles = int(os.environ.get("BENCH_SEL_TILES", "36"))
    use_sel = os.environ.get("BENCH_SEL", "1") != "0"

    def build(n_total, sh_degree, seed=0):
        nb = max(n_total // 20, 100)
        na = max(n_total // 50, 50)
        return _build_scene(n_bg=n_total - nb - na, n_block=nb, n_agent=na,
                            seed=seed, sh_degree=sh_degree)

    def measure(label, graph_, cached, iters, nb=B, sel_override=None,
                fwd_override=False):
        """Compile + time one configuration; returns (frames/s, n_severe).

        ``cached`` ∈ {True, False, "moving", "moving_cached"}: True =
        static-tile-cache path (fixed camera), False = plain full-rebin
        fixed camera, "moving" = per-env agent-attached camera with full
        per-frame rebin, "moving_cached" = the round-5 candidate-cache
        rollout (R frames per call, ops/rasterize_moving.py).  ``n_severe``
        is the run's severe-drop count (sel-dropped tiles / margin
        violations) — 0 ⇒ the recorded render is exact."""
        st = sel_override if sel_override is not None else sel_tiles
        frames_mult = 1
        keys = jax.random.split(jax.random.key(0), nb)
        actions = jnp.tile(jnp.asarray([150.0, 250.0], jnp.float32), (nb, 1))
        if cached == "moving_cached":
            R = int(os.environ.get("MOVING_R", "32"))
            margin = float(os.environ.get("MOVING_MARGIN", "16"))
            kc = int(os.environ.get("MOVING_KC", "512"))
            frames_mult = R
            mv_raster = raster._replace(
                buckets=((4, 0.80), (9, 0.12), (16, 0.08)))
            rollout, P = _make_step_moving_cached(
                graph_, RES, RES, mv_raster, R=R, margin=margin, kc=kc,
                dyn_capacity=dyn_cap, dyn_max_tiles=dyn_m)

            def loss_of(scene, states, actions):
                ns, loss, flags = rollout(scene, states, actions)
                return loss, (ns, flags)
        elif cached == "moving":
            mv_raster = raster._replace(
                buckets=((4, 0.80), (9, 0.12), (16, 0.08)))
            step, P = _make_step_moving(graph_, RES, RES, mv_raster)

            def loss_of(scene, states, actions):
                new_states, imgs = jax.vmap(
                    lambda s, a: step(scene, s, a))(states, actions)
                return jnp.mean(imgs ** 2), (new_states,
                                             jnp.zeros((2,), jnp.int32))
        elif cached and use_sel and backend == "pallas":
            # production env path, round-3 kernel: static background binned
            # + composited once per train step; per-env dynamic lists are
            # compacted to the ≤ sel_tiles touched tiles and composited in
            # ONE (B, TT)-grid scalar-prefetch pallas launch
            prepare, step_b, P = _make_step_cached_batch(
                graph_, RES, RES, raster, dyn_capacity=dyn_cap,
                sel_tiles=st, dyn_max_tiles=dyn_m)

            def loss_of(scene, states, actions):
                cache = prepare(scene)
                new_states, imgs, n_drop = step_b(cache, scene, states,
                                                  actions)
                return jnp.mean(imgs ** 2), (new_states, n_drop)
        elif cached:
            # per-env fused-pair/merge path (pre-round-3; BENCH_SEL=0)
            prepare, step_c, P = _make_step_cached(
                graph_, RES, RES, raster, dyn_capacity=dyn_cap,
                static_skip=skip, dyn_max_tiles=dyn_m)

            def loss_of(scene, states, actions):
                cache = prepare(scene)
                new_states, imgs = jax.vmap(
                    lambda s, a: step_c(cache, scene, s, a))(states, actions)
                return jnp.mean(imgs ** 2), (new_states,
                                             jnp.zeros((2,), jnp.int32))
        else:
            step, P = _make_step(graph_, RES, RES, raster)

            def loss_of(scene, states, actions):
                new_states, imgs = jax.vmap(
                    lambda s, a: step(scene, s, a))(states, actions)
                return jnp.mean(imgs ** 2), (new_states,
                                             jnp.zeros((2,), jnp.int32))

        states = jax.jit(jax.vmap(lambda k: pusht.reset(P, k)))(keys)

        if fwd_only or fwd_override:
            def fwd_bwd(scene, states, actions):
                loss, (new_states, n_drop) = loss_of(scene, states, actions)
                return new_states, loss, n_drop, None
        else:
            def fwd_bwd(scene, states, actions):
                (loss, (new_states, n_drop)), grads = jax.value_and_grad(
                    lambda sc: loss_of(sc, states, actions),
                    has_aux=True)(scene)
                return new_states, loss, n_drop, grads

        jitted = jax.jit(fwd_bwd, donate_argnums=(1,))
        log(f"[{label}] compiling...")
        t0 = time.time()
        states, loss, n_drop, grads = jitted(graph_.scene, states, actions)
        jax.block_until_ready(loss)
        n_over, n_trunc = (int(n_drop[0]), int(n_drop[1]))
        log(f"[{label}] compiled+first step in {time.time() - t0:.1f}s, "
            f"loss={float(loss):.5f} severe_dropped={n_over} "
            f"bounded_truncated={n_trunc}")
        if n_over > 0:
            log(f"[{label}] WARNING: {n_over} severe drops (sel-dropped "
                "tiles / margin violations — render inexact)")
        t0 = time.time()
        for _ in range(iters):
            states, loss, n_drop, grads = jitted(graph_.scene, states, actions)
        jax.block_until_ready(loss)
        # the exactness claim is about the STEADY-STATE frames being
        # timed: read the severe counter from the last timed iteration
        # (the compile call can carry reset-transient margin violations)
        n_over = int(n_drop[0])
        dt = time.time() - t0
        frames = nb * iters * frames_mult
        fps = frames / dt
        log(f"[{label}] {frames} frames in {dt:.2f}s → {fps:.1f} f/s "
            f"(ms/frame {1e3 * dt / frames:.2f})")
        return fps, n_over

    def sel_bound(graph_):
        """Computed touched-tile upper bound for the fixed camera (VERDICT
        r4 #4): per dynamic body, the screen-projected footprint diameter
        (max in-plane extent + 3σ + blur pad) can touch at most
        (⌊d/ts⌋+2)² tiles at any planar pose; sum over bodies.  Used as the
        retry bound when a run reports sel-dropped tiles."""
        ids_b = np.asarray(graph_.link_ids)
        means = np.asarray(graph_.scene.means)
        scales = np.exp(np.asarray(graph_.scene.log_scales)).max(-1)
        f = 0.5 * RES / np.tan(0.525)
        total = 0
        for b in np.unique(ids_b[ids_b > 0]):
            m = ids_b == b
            c = means[m, :2].mean(0)
            rad = (np.sqrt(((means[m, :2] - c) ** 2).sum(-1)).max()
                   + 3.0 * scales[m].max())
            depth = 450.0 + means[m, 2].min()
            d_screen = 2.0 * rad * f / max(depth - rad, 1.0) + 4.0
            t = int(d_screen // 16) + 2
            total += t * t
        return int(total)

    def measure_exact(label, graph_, cached, iters, nb=B):
        """measure(), re-run with raised sel_tiles until no tiles drop —
        scale variants must record EXACT renders (VERDICT r4 #4; the
        reference never drops primitives, splat_handler.py:282-289).
        Ladder: +⅓ first (the kernel is grid-overhead-bound, so slack is
        expensive — divar-292k is exact at 48 and 27% faster than at the
        conservative bound's 80), then the computed touched-tile bound,
        which is sufficient by construction."""
        fps_, n_over = measure(label, graph_, cached, iters, nb=nb)
        used = sel_tiles
        if n_over > 0 and cached is True:
            bound = max(sel_bound(graph_), 2 * sel_tiles)
            step_up = min(max((sel_tiles * 4 // 3 + 3) // 4 * 4,
                              sel_tiles + 8), bound)
            for used in dict.fromkeys((step_up, bound)):
                log(f"[{label}] retrying with sel_tiles={used} "
                    f"(computed bound {bound})")
                fps_, n_over = measure(f"{label}:retry{used}", graph_,
                                       cached, iters, nb=nb,
                                       sel_override=used)
                if n_over == 0:
                    break
        return fps_, n_over, used

    # PRIMARY = the honest config: sh_degree 3 (every reference scene is
    # sh_degree 3 / classic, divar config.yml:200-204), static-cache path.
    t0 = time.time()
    g3 = build(N, sh_degree=3)
    log(f"scene build+put: {time.time() - t0:.1f}s")
    fps, prim_over, prim_sel = measure_exact("primary:sh3_cached", g3,
                                             use_cache, ITERS)

    def roofline(fps):
        """Analytic speed-of-light accounting for the primary config
        (VERDICT r4 #4) — model FLOPs/bytes per frame vs v5e peaks
        (197 TFLOP/s bf16 MXU, 819 GB/s HBM).  Upper-bound work model
        (term_eps early-stop not modeled; the measured-count version is
        benchmarks/profile_sel.py / PROFILE.md)."""
        ts, P_, Kd, C = 16, 256, dyn_cap, 128
        T = (RES // ts) ** 2
        ncs = cap // C
        # sel kernel: per slot, ncs chunks × 2 (P,Kd)×(Kd,C)-class dots at
        # 3 bf16-split passes; fwd+bwd ≈ 3.5× fwd; slots/env ≤ sel_tiles
        mxu = (sel_tiles * ncs * 2 * 2 * P_ * Kd * C * 3) * 3.5
        # per-frame HBM: sel blocks + per-step static prepare ÷ B
        hbm = (sel_tiles * (10 * cap + 10 * Kd + 2 * 8 * P_) * 4 * 2
               + (N * (14 + 48 + 8) * 4 + T * cap * 10 * 4 * 2 * 2) / B)
        t_frame = 1.0 / fps
        return {
            "model_mxu_tflop_frame": round(mxu / 1e12, 4),
            "model_hbm_mb_frame": round(hbm / 1e6, 2),
            "mxu_util": round(mxu / 197e12 / t_frame, 4),
            "bw_util": round(hbm / 819e9 / t_frame, 4),
        }

    sol = roofline(fps)
    log(f"roofline (model): {json.dumps(sol)}")

    out_variants = {}

    def run_variant(name, fn, min_left=60.0):
        """Variants never break the metric and each gets a budget check."""
        only = os.environ.get("BENCH_ONLY", "")
        if only and name not in only.split(","):
            log(f"variant {name} skipped (BENCH_ONLY={only})")
            return
        if left() < min_left:
            log(f"variant {name} skipped: {left():.0f}s left < {min_left}s")
            return
        try:
            t0 = time.time()
            value, unit, extra = fn()
            out_variants[name] = dict(value=round(value, 2), unit=unit,
                                      **extra)
            log(f'variant {name}: {json.dumps(out_variants[name])} '
                f'({time.time() - t0:.0f}s)')
        except Exception as e:
            log(f"variant {name} failed: {e!r}")
            out_variants[name] = dict(error=repr(e))

    if variants:
        # priority order: the two round-3-unproven claims first (product
        # path and moving camera), then DC, then reference-scene scale
        def product():
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
            from bench_product import measure_product
            pb = min(B, 16)
            pR = int(os.environ.get("PRODUCT_R", "32"))
            fpsp = measure_product(B=pb, N=N, iters=max(ITERS // 2, 3),
                                   log=log)
            return fpsp, "env_frames/s/chip", dict(
                B=pb, R=pR, res="240x320", cameras=2,
                metric="arm_splat_wrapper_2cam_rollout_fwdbwd")

        run_variant("product_2cam", product, min_left=75.0)

        def moving():
            # round-5 fast path: candidate-cache rollout (R frames/chunk);
            # n_severe counts margin-violated env-frames — 0 ⇒ exact
            mb = int(os.environ.get("MOVING_B", str(min(B, 16))))
            R = int(os.environ.get("MOVING_R", "32"))
            fpsm, n_sev = measure("variant:moving_cached", g3,
                                  "moving_cached", max(ITERS // 2, 3),
                                  nb=mb)
            return fpsm, "frames/s/chip", dict(
                B=mb, R=R, exact=(n_sev == 0),
                metric=f"moving_camera_cached_rollout_{RES}x{RES}_fwdbwd")

        run_variant("moving_camera", moving, min_left=75.0)

        def moving_fwd():
            # forward-only rollout — the TELEOP direction (observation
            # generation without training); grads are the datagen story
            mb = int(os.environ.get("MOVING_B", "32"))
            R = int(os.environ.get("MOVING_R", "32"))
            fpsm, n_sev = measure("variant:moving_cached_fwd", g3,
                                  "moving_cached", max(ITERS // 2, 3),
                                  nb=mb, fwd_override=True)
            return fpsm, "frames/s/chip", dict(
                B=mb, R=R, exact=(n_sev == 0),
                metric=f"moving_camera_cached_rollout_{RES}x{RES}_fwdonly")

        run_variant("moving_fwd", moving_fwd, min_left=70.0)

        if scales:
            # reference-scene scale: divar113vhw = 292,247 gaussians,
            # robots-scene-v2 = 113,831 (SURVEY §6 mask counts) — ranked
            # above the DC-only variant: scale behavior is a round-3 gap
            for n_ref, tag in ((292247, "divar_292k"), (113831, "xarm_114k")):
                def scale(n_ref=n_ref, tag=tag):
                    gs = build(n_ref, sh_degree=3)
                    fpss, n_over, used = measure_exact(
                        f"variant:sh3_{tag}", gs, use_cache,
                        max(ITERS // 2, 3))
                    return fpss, "frames/s/chip", dict(
                        N=n_ref, sel_tiles=used, exact=(n_over == 0),
                        metric=f"sh3_cached_{RES}x{RES}_fwdbwd")

                run_variant(f"scale_{tag}", scale, min_left=75.0)

        def latency():
            # teleop latency: ONE env step + 2-camera render, B=1, forward
            # only, post-compile — the reference's interactive product runs
            # a 10 Hz human loop (demo_pusht_splat.py:171); datagen
            # throughput (B≫1) and teleop latency are different products
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
            from bench_product import measure_latency
            ms = measure_latency(N=N, iters=max(ITERS, 10), log=log)
            return ms, "ms/step", dict(
                B=1, res="240x320", cameras=2,
                metric="teleop_step_latency_fwd_b1")

        run_variant("latency_b1", latency, min_left=70.0)

        def moving_rebin():
            # legacy full per-frame rebin (kept for the speedup record)
            mb = min(B, 16)
            fpsm, _ = measure("variant:moving_rebin", g3, "moving",
                              max(ITERS // 2, 3), nb=mb)
            return fpsm, "frames/s/chip", dict(
                B=mb, metric=f"moving_camera_full_rebin_{RES}x{RES}_fwdbwd")

        run_variant("moving_rebin", moving_rebin, min_left=75.0)

        def dc():
            g0 = build(N, sh_degree=0)
            fps0, _ = measure("variant:dc_cached", g0, use_cache,
                              max(ITERS // 2, 3))
            return fps0, "frames/s/chip", dict(
                metric=f"dc_only_cached_{RES}x{RES}_fwdbwd")

        run_variant("dc_cached", dc, min_left=60.0)

    target_per_chip = 10_000 / 16.0
    result = {
        "metric": f"pusht_splat_env_sh3_frames_per_s_per_chip_{RES}x{RES}_fwdbwd",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / target_per_chip, 4),
        "B": B,
        "N": N,
        "sel_tiles": prim_sel,
        "exact": prim_over == 0,
        "sol": sol,
        "variants": out_variants,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
