"""Round-4 config sweep of the bench primary on the real chip.

One process, one scene, many (B, sel_exact_fwd, tile_capacity) configs of
``_make_step_cached_batch``'s full fwd+bwd step — picks the bench default
(the round-2 B=32 choice predates the sel kernel, whose per-env cost no
longer scales with the static tile count; VERDICT r3 weak #6).

Usage: python benchmarks/sweep_r04.py        (env: SWEEP_CONFIGS as
"B:cap:prec;..." with prec ∈ {hi6, hi3, bf16}, BENCH_N, BENCH_ITERS)
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


PREC = {"hi6": True, "split": "split", "bf16": False}


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(Path(__file__).resolve().parent.parent / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene, _make_step_cached_batch
    from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
    from sim_a_splat_tpu.physics import pusht

    N = int(os.environ.get("BENCH_N", "100000"))
    RES = int(os.environ.get("BENCH_RES", "256"))
    ITERS = int(os.environ.get("BENCH_ITERS", "8"))
    configs = os.environ.get(
        "SWEEP_CONFIGS",
        "32:1024:hi6;64:1024:hi6;128:1024:hi6;"
        "64:1024:hi3;64:512:hi3;128:1024:hi3;128:512:hi3")

    dev = jax.devices()[0]
    log(f"sweep: device={dev.platform}/{dev.device_kind} N={N} res={RES}")

    n_block = max(N // 20, 100)
    n_agent = max(N // 50, 50)
    g3 = _build_scene(n_bg=N - n_block - n_agent, n_block=n_block,
                      n_agent=n_agent, seed=0, sh_degree=3)

    results = {}
    for spec in configs.split(";"):
        parts = spec.split(":")
        Bs, caps, precs = parts[:3]
        sel_t = int(parts[3]) if len(parts) > 3 else 96
        B, cap = int(Bs), int(caps)
        raster = RasterConfig(
            tile_size=16, tile_capacity=cap, max_tiles_per_gaussian=16,
            chunk=128, sigma_cutoff=3.0, backend="pallas", term_eps=1e-4,
            sel_exact_fwd=PREC[precs],
            buckets=((4, 0.90), (6, 0.06), (9, 0.04)))
        prepare, step_b, P = _make_step_cached_batch(
            g3, RES, RES, raster, dyn_capacity=128, sel_tiles=sel_t,
            dyn_max_tiles=9)

        def loss_of(scene, states, actions):
            cache = prepare(scene)
            ns, imgs, _ = step_b(cache, scene, states, actions)
            return jnp.mean(imgs ** 2), ns

        def fwd_bwd(scene, states, actions):
            (loss, ns), grads = jax.value_and_grad(
                lambda sc: loss_of(sc, states, actions), has_aux=True)(scene)
            return ns, loss, grads

        keys = jax.random.split(jax.random.key(0), B)
        states = jax.jit(jax.vmap(lambda k: pusht.reset(P, k)))(keys)
        actions = jnp.tile(jnp.asarray([150.0, 250.0], jnp.float32), (B, 1))
        jitted = jax.jit(fwd_bwd, donate_argnums=(1,))
        log(f"[{spec}] compiling...")
        t0 = time.time()
        try:
            states, loss, grads = jitted(g3.scene, states, actions)
            jax.block_until_ready(loss)
        except Exception as e:
            log(f"[{spec}] FAILED: {e!r}")
            results[spec] = dict(error=repr(e))
            continue
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(ITERS):
            states, loss, grads = jitted(g3.scene, states, actions)
        jax.block_until_ready(loss)
        dt = time.time() - t0
        fps = B * ITERS / dt
        results[spec] = dict(fps=round(fps, 1),
                             ms_frame=round(1e3 * dt / (B * ITERS), 3),
                             loss=round(float(loss), 5),
                             compile_s=round(tc, 1))
        log(f"[{spec}] {fps:8.1f} f/s  ({1e3 * dt / (B * ITERS):.3f} "
            f"ms/frame)  loss={float(loss):.5f}  compile {tc:.0f}s")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
