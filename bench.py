"""Benchmark: pushT splat env observation throughput, fwd+bwd, per chip.

Primary metric (BASELINE.md north star): frames/s/chip rendering 256×256
observations for a batch of parallel pushT splat envs — full pipeline per
frame: physics control step (10 substeps) → scene-graph posing → 3DGS tile
rasterization → pixel-loss backward to all gaussian parameters.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
reported against the north-star target density of 10_000 frames/s on a
v5e-16 ⇒ 625 frames/s/chip.

Prints exactly ONE JSON line on stdout; progress goes to stderr.
Env overrides: BENCH_B (envs), BENCH_N (gaussians), BENCH_RES, BENCH_ITERS.
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
    import jax.numpy as jnp

    from __graft_entry__ import (
        _build_scene, _make_step, _make_step_cached, _make_step_cached_batch,
        _make_step_moving,
    )
    from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
    from sim_a_splat_tpu.physics import pusht

    # B=32 from the round-2 batch sweep: 8 → 106 f/s, 32 → 154, 64 → 134
    # (per-step static prepare amortizes; 64 regresses on HBM pressure)
    B = int(os.environ.get("BENCH_B", "32"))
    N = int(os.environ.get("BENCH_N", "100000"))
    RES = int(os.environ.get("BENCH_RES", "256"))
    ITERS = int(os.environ.get("BENCH_ITERS", "10"))
    use_cache = os.environ.get("BENCH_CACHE", "1") != "0"
    fwd_only = os.environ.get("BENCH_FWDONLY", "0") != "0"
    variants = os.environ.get("BENCH_VARIANTS", "1") != "0"
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "420"))
    t_start = time.time()

    dev = jax.devices()[0]
    log(f"bench: device={dev.platform}/{dev.device_kind} B={B} N={N} "
        f"res={RES} iters={ITERS} cache={use_cache} fwd_only={fwd_only}")

    n_block = max(N // 20, 100)
    n_agent = max(N // 50, 50)
    graph = _build_scene(n_bg=N - n_block - n_agent, n_block=n_block,
                         n_agent=n_agent, seed=0)
    backend = os.environ.get(
        "BENCH_BACKEND",
        "pallas" if dev.platform == "tpu" else "xla")
    cap = int(os.environ.get("BENCH_TILE_CAP", "1024"))
    term = float(os.environ.get("BENCH_TERM", "1e-4"))  # gsplat's stop eps
    raster = RasterConfig(tile_size=16, tile_capacity=cap,
                          max_tiles_per_gaussian=16, chunk=128,
                          sigma_cutoff=3.0, backend=backend,
                          term_eps=term if term > 0 else None,
                          # footprint-bucketed binning: measured nt
                          # distribution of the bench scene is p50=4,
                          # p99=6, max=9 — the top-4% 9-slot bucket covers
                          # every gaussian with nt>6, so this is
                          # truncation-free (r3: image bit-identical to the
                          # old ((4,.8),(9,.12),(16,.08)) buckets) and
                          # shrinks the static binning sort a further ~23%
                          buckets=((4, 0.90), (6, 0.06), (9, 0.04)))

    dyn_cap = int(os.environ.get("BENCH_DYN_CAP", "128"))
    dyn_m = int(os.environ.get("BENCH_DYN_M", "9"))
    skip = os.environ.get("BENCH_SKIP", "1") != "0"
    # selected-tile batched kernel (ops/pallas_composite_sel): composite only
    # the tiles the dynamic gaussians touch, via a scalar-prefetched (B, TT)
    # grid.  sel_tiles bounds touched tiles per env (overflow falls back to
    # the static composite and is counted in aux; 96 covers the bench scene
    # with ~0 overflow — loss is bit-identical to the per-env pair path)
    sel_tiles = int(os.environ.get("BENCH_SEL_TILES", "96"))
    use_sel = os.environ.get("BENCH_SEL", "1") != "0"

    def measure(label, graph_, cached, iters, nb=B):
        """Compile + time one configuration; returns frames/s.

        ``cached`` ∈ {True, False, "moving"}: True = static-tile-cache path
        (fixed camera), False = plain full-rebin fixed camera, "moving" =
        per-env agent-attached camera (full rebin, bucketed binning)."""
        keys = jax.random.split(jax.random.key(0), nb)
        actions = jnp.tile(jnp.asarray([150.0, 250.0], jnp.float32), (nb, 1))
        if cached == "moving":
            mv_raster = raster._replace(
                buckets=((4, 0.80), (9, 0.12), (16, 0.08)))
            step, P = _make_step_moving(graph_, RES, RES, mv_raster)

            def loss_of(scene, states, actions):
                new_states, imgs = jax.vmap(
                    lambda s, a: step(scene, s, a))(states, actions)
                return jnp.mean(imgs ** 2), new_states
        elif cached and use_sel and backend == "pallas":
            # production env path, round-3 kernel: static background binned
            # + composited once per train step; per-env dynamic lists are
            # compacted to the ≤ sel_tiles touched tiles and composited in
            # ONE (B, TT)-grid scalar-prefetch pallas launch
            prepare, step_b, P = _make_step_cached_batch(
                graph_, RES, RES, raster, dyn_capacity=dyn_cap,
                sel_tiles=sel_tiles, dyn_max_tiles=dyn_m)

            def loss_of(scene, states, actions):
                cache = prepare(scene)
                new_states, imgs = step_b(cache, scene, states, actions)
                return jnp.mean(imgs ** 2), new_states
        elif cached:
            # per-env fused-pair/merge path (pre-round-3; BENCH_SEL=0)
            prepare, step_c, P = _make_step_cached(
                graph_, RES, RES, raster, dyn_capacity=dyn_cap,
                static_skip=skip, dyn_max_tiles=dyn_m)

            def loss_of(scene, states, actions):
                cache = prepare(scene)
                new_states, imgs = jax.vmap(
                    lambda s, a: step_c(cache, scene, s, a))(states, actions)
                return jnp.mean(imgs ** 2), new_states
        else:
            step, P = _make_step(graph_, RES, RES, raster)

            def loss_of(scene, states, actions):
                new_states, imgs = jax.vmap(
                    lambda s, a: step(scene, s, a))(states, actions)
                return jnp.mean(imgs ** 2), new_states

        states = jax.jit(jax.vmap(lambda k: pusht.reset(P, k)))(keys)

        if fwd_only:
            def fwd_bwd(scene, states, actions):
                loss, new_states = loss_of(scene, states, actions)
                return new_states, loss, None
        else:
            def fwd_bwd(scene, states, actions):
                (loss, new_states), grads = jax.value_and_grad(
                    lambda sc: loss_of(sc, states, actions),
                    has_aux=True)(scene)
                return new_states, loss, grads

        jitted = jax.jit(fwd_bwd, donate_argnums=(1,))
        log(f"[{label}] compiling...")
        t0 = time.time()
        states, loss, grads = jitted(graph_.scene, states, actions)
        jax.block_until_ready(loss)
        log(f"[{label}] compiled+first step in {time.time() - t0:.1f}s, "
            f"loss={float(loss):.5f}")
        t0 = time.time()
        for _ in range(iters):
            states, loss, grads = jitted(graph_.scene, states, actions)
        jax.block_until_ready(loss)
        dt = time.time() - t0
        frames = nb * iters
        fps = frames / dt
        log(f"[{label}] {frames} frames in {dt:.2f}s → {fps:.1f} f/s "
            f"(ms/frame {1e3 * dt / frames:.2f})")
        return fps

    # PRIMARY = the honest config: sh_degree 3 (every reference scene is
    # sh_degree 3 / classic, divar config.yml:200-204), static-cache path.
    g3 = _build_scene(n_bg=N - n_block - n_agent, n_block=n_block,
                      n_agent=n_agent, seed=0, sh_degree=3)
    fps = measure("primary:sh3_cached", g3, use_cache, ITERS)

    # representative-config variants (stderr only)
    if variants:
        try:
            if time.time() - t_start < budget_s:
                fps0 = measure("variant:dc_cached", graph, True,
                               max(ITERS // 2, 3))
                log(f'variant {{"metric": "dc_only_cached_{RES}x{RES}_'
                    f'fwdbwd", "value": {round(fps0, 2)}, '
                    f'"unit": "frames/s/chip"}}')
            else:
                log("variant dc skipped: over time budget")
            if time.time() - t_start < budget_s:
                # agent-attached camera: full per-frame rebin of all N via
                # project_raw (no covariance temps — the round-2 OOM is
                # gone), bucketed binning
                fpsm = measure("variant:moving_camera", g3, "moving",
                               max(ITERS // 2, 3))
                log(f'variant {{"metric": "moving_camera_full_rebin_'
                    f'{RES}x{RES}_fwdbwd", "value": {round(fpsm, 2)}, '
                    f'"unit": "frames/s/chip", "B": {B}}}')
            else:
                log("variant moving skipped: over time budget")
            if time.time() - t_start < budget_s:
                # BASELINE config 4: articulated arm scene, 2 cameras
                # (fixed viewport + moving EEF), end-to-end through
                # SplatEnvWrapperF (the reference's actual product loop,
                # splat_env_wrapper.py:140-159)
                sys.path.insert(0, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
                from bench_product import measure_product
                fpsp = measure_product(B=min(B, 8), N=N,
                                       iters=max(ITERS // 2, 3), log=log)
                log(f'variant {{"metric": "arm_splat_wrapper_2cam_240x320_'
                    f'fwdbwd", "value": {round(fpsp, 2)}, '
                    f'"unit": "env_frames/s/chip", "B": {min(B, 8)}}}')
            else:
                log("variant product skipped: over time budget")
        except Exception as e:       # variants must never break the metric
            log(f"variant failed: {e!r}")

    target_per_chip = 10_000 / 16.0
    result = {
        "metric": f"pusht_splat_env_sh3_frames_per_s_per_chip_{RES}x{RES}_fwdbwd",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / target_per_chip, 4),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
