"""Scaling-efficiency harness: env-sharded datagen over an N-device mesh.

Measures the BASELINE.md scaling points (1 chip / 1 host / ≥2 hosts):
frames/s of the full pushT-splat step (physics → scene graph → tile render
→ pixel-loss backward) for mesh sizes 1, 2, 4, ..., D and reports parallel
efficiency vs the 1-device run.  On real hardware it uses the actual
devices; on CPU set ``XLA_FLAGS=--xla_force_host_platform_device_count=8``
to validate the sharding (the numbers then measure the harness, not a TPU).

    python benchmarks/scaling.py            # all power-of-two mesh sizes
    BENCH_B=64 BENCH_RES=128 python benchmarks/scaling.py

Prints one JSON line per mesh size plus a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_mesh(n_devices: int, B: int, N: int, RES: int, ITERS: int) -> float:
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_scene, _make_step
    from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
    from sim_a_splat_tpu.parallel import ENV_AXIS, make_mesh, shard_batch
    from sim_a_splat_tpu.parallel.mesh import env_sharding, replicated
    from sim_a_splat_tpu.physics import pusht

    mesh = make_mesh(env=n_devices, prim=1,
                     devices=jax.devices()[:n_devices])
    n_block = max(N // 20, 100)
    n_agent = max(N // 50, 50)
    graph = _build_scene(n_bg=N - n_block - n_agent, n_block=n_block,
                         n_agent=n_agent, seed=0)
    backend = os.environ.get(
        "BENCH_BACKEND",
        "pallas" if jax.devices()[0].platform == "tpu" else "xla")
    raster = RasterConfig(tile_size=16, tile_capacity=1024,
                          max_tiles_per_gaussian=16, chunk=128,
                          sigma_cutoff=3.0, backend=backend)
    step, P = _make_step(graph, RES, RES, raster)

    keys = jax.random.split(jax.random.key(0), B)
    states = shard_batch(mesh, jax.vmap(lambda k: pusht.reset(P, k))(keys))
    actions = shard_batch(
        mesh, jnp.tile(jnp.asarray([150.0, 250.0], jnp.float32), (B, 1)))

    def fwd_bwd(scene, states, actions):
        def loss_fn(sc):
            new_states, imgs = jax.vmap(
                lambda s, a: step(sc, s, a))(states, actions)
            return jnp.mean(imgs ** 2), new_states
        (loss, new_states), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(scene)
        return new_states, loss, grads

    s_env = env_sharding(mesh)
    s_rep = replicated(mesh)
    jitted = jax.jit(fwd_bwd, donate_argnums=(1,),
                     in_shardings=(s_rep, s_env, s_env),
                     out_shardings=(s_env, s_rep, s_rep))

    t0 = time.time()
    states, loss, grads = jitted(graph.scene, states, actions)
    jax.block_until_ready(loss)
    log(f"  mesh={n_devices}: compiled in {time.time() - t0:.1f}s")

    t0 = time.time()
    for _ in range(ITERS):
        states, loss, grads = jitted(graph.scene, states, actions)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    return B * ITERS / dt


def main():
    import jax
    # honor JAX_PLATFORMS=cpu even when a TPU plugin is ambient (plugins
    # outrank the env var; jax.config outranks both — see tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    B = int(os.environ.get("BENCH_B", "32"))
    N = int(os.environ.get("BENCH_N", "20000"))
    RES = int(os.environ.get("BENCH_RES", "128"))
    ITERS = int(os.environ.get("BENCH_ITERS", "10"))

    D = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= D]
    # virtual CPU devices oversubscribe the physical cores: efficiency
    # rows beyond the core count measure host contention, not scaling —
    # mark them invalid in the artifact (VERDICT r3 weak #3)
    ncores = os.cpu_count() or 1
    virtual = jax.devices()[0].platform == "cpu"
    log(f"devices: {D} × {jax.devices()[0].device_kind}; "
        f"mesh sizes {sizes}; B={B} N={N} res={RES} "
        f"(virtual={virtual}, physical cores={ncores})")

    results = {}
    for d in sizes:
        fps = bench_mesh(d, B, N, RES, ITERS)
        eff = fps / (results[1] * d) if 1 in results and d > 1 else 1.0
        results[d] = fps
        print(json.dumps({
            "metric": f"scaling_fps_mesh{d}", "value": round(fps, 2),
            "unit": "frames/s", "scaling_efficiency": round(eff, 4),
            "valid": (not virtual) or d <= ncores,
        }), flush=True)

    print(json.dumps({
        "metric": "scaling_efficiency_max_mesh",
        "value": round(results[sizes[-1]] / (results[1] * sizes[-1]), 4)
        if len(sizes) > 1 else 1.0,
        "unit": "fraction",
        "fps_per_mesh": {str(k): round(v, 1) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
