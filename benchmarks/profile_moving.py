"""Stage profile of the MOVING-camera render path (VERDICT r4 weak #1).

The moving/product path (`_make_step_moving`, the EEF-mounted camera of
the reference teleop loop — demo_pusht_splat.py:67-78,
splat_env_wrapper.py:140-159) runs 30-40× slower than the fixed-camera
sel path (25 vs 766 f/s) because every frame re-projects and re-bins ALL
N gaussians per env.  This profiler isolates where its milliseconds go so
the round-5 optimization attacks measured stages, not guesses — the same
discipline that took the primary 367→766 in round 4 (profile_sel.py).

Stages (all per batch of B envs, each with its own camera):
  physics+pose     — control step + dynamic posing (vmapped)
  sh_all           — per-env SH eval of ALL N gaussians (per-env view dirs)
  project_all      — per-env project_raw of ALL N
  bin              — per-env bucketed E-element binning sort
  gather           — per-env (T, K) payload row gather
  composite_f      — per-env dense pallas composite, forward
  step_fwd / step_fwdbwd — the full step

Usage: python benchmarks/profile_moving.py   [BENCH_B/BENCH_N/BENCH_RES]
Writes the stage table to stderr, one JSON line to stdout.
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

    from __graft_entry__ import _build_scene, _make_step_moving
    from sim_a_splat_tpu.ops import Camera, SE3, quaternion as quat
    from sim_a_splat_tpu.ops import sh as sh_ops
    from sim_a_splat_tpu.ops.projection import project_raw, view_directions
    from sim_a_splat_tpu.ops.rasterize_tiles import (
        RasterConfig, _bin_gaussians, composite_dispatch, gather_tile_lists,
    )
    from sim_a_splat_tpu.physics import PushTParams, pusht
    from sim_a_splat_tpu.utils.profiling import time_jitted

    B = int(os.environ.get("BENCH_B", "16"))
    N = int(os.environ.get("BENCH_N", "100000"))
    RES = int(os.environ.get("BENCH_RES", "256"))
    cap = int(os.environ.get("BENCH_TILE_CAP", "1024"))
    term = float(os.environ.get("BENCH_TERM", "1e-4"))
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    dev = jax.devices()[0]
    log(f"profile_moving: device={dev.platform}/{dev.device_kind} B={B} "
        f"N={N} res={RES} cap={cap} backend={backend}")

    n_block = max(N // 20, 100)
    n_agent = max(N // 50, 50)
    graph = _build_scene(n_bg=N - n_block - n_agent, n_block=n_block,
                         n_agent=n_agent, seed=0, sh_degree=3)
    # the bench's moving-variant raster config (bench.py measure "moving")
    raster = RasterConfig(tile_size=16, tile_capacity=cap,
                          max_tiles_per_gaussian=16, chunk=128,
                          sigma_cutoff=3.0, backend=backend,
                          term_eps=term if term > 0 else None,
                          buckets=((4, 0.80), (9, 0.12), (16, 0.08)))
    ts = raster.tile_size
    tx = -(-RES // ts)
    ty = -(-RES // ts)
    T = tx * ty

    P = PushTParams()
    keys = jax.random.split(jax.random.key(0), B)
    states = jax.jit(jax.vmap(lambda k: pusht.reset(P, k)))(keys)
    actions = jnp.tile(jnp.asarray([150.0, 250.0], jnp.float32), (B, 1))
    jax.block_until_ready(states)

    ids_np = np.asarray(graph.link_ids)
    stat_idx = jnp.asarray(np.where(ids_np == 0)[0], jnp.int32)
    dyn_idx = jnp.asarray(np.where(ids_np > 0)[0], jnp.int32)
    dyn_ids = jnp.asarray(ids_np[ids_np > 0], jnp.int32)
    scene = graph.scene
    dyn = scene.select(dyn_idx)
    st = scene.select(stat_idx)

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

    # per-env camera exactly as _make_step_moving builds it
    def cam_of(state):
        cam_t = jnp.concatenate([state.agent_pos, jnp.zeros(1)]) + \
            jnp.asarray([0.0, -40.0, -420.0])
        return Camera.from_fov(SE3(jnp.asarray([1.0, 0, 0, 0]), cam_t),
                               1.05, RES, RES)

    def pose2d(xy, angle):
        return (quat.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), angle),
                jnp.concatenate([xy, jnp.zeros(1)]))

    def pose_fn(states, actions):
        def one(state, action):
            state = pusht.control_step(P, state, action)
            qb, tb = pose2d(state.block_pos, state.block_angle)
            qa, ta = pose2d(state.agent_pos, jnp.zeros(()))
            body = SE3(jnp.stack([jnp.asarray([1.0, 0, 0, 0]), qb, qa]),
                       jnp.stack([jnp.zeros(3), tb, ta]))
            rel = body.compose(graph.rest_inv)
            q_g, t_g = rel.q[dyn_ids], rel.t[dyn_ids]
            return (state, quat.rotate(q_g, dyn.means) + t_g,
                    quat.multiply(q_g, dyn.quats))
        return jax.vmap(one)(states, actions)

    new_states, d_means, d_quats = bench("physics+pose", pose_fn,
                                         states, actions)

    def means_all_fn(d_means):
        return jax.vmap(
            lambda dm: jnp.concatenate([st.means, dm]))(d_means)

    means_all = jax.jit(means_all_fn)(d_means)

    def sh_fn(means_all, states):
        def one(ma, state):
            dirs = view_directions(ma, cam_of(state))
            sh_all = jnp.concatenate([st.sh_coeffs(), dyn.sh_coeffs()])
            return sh_ops.eval_sh_color(sh_all, dirs, scene.sh_degree)
        return jax.vmap(one)(means_all, states)

    colors = bench("sh_all_perenv", sh_fn, means_all, new_states)

    def proj_fn(d_means, d_quats, states):
        def one(dm, dq, state):
            cam = cam_of(state)
            ps = project_raw(st.means, st.quats, st.log_scales, cam)
            pd = project_raw(dm, dq, dyn.log_scales, cam)
            from sim_a_splat_tpu.ops.projection import Projected
            return Projected(*[jnp.concatenate([a, b])
                               for a, b in zip(ps, pd)])
        return jax.vmap(one)(d_means, d_quats, new_states)

    proj = bench("project_all_perenv", proj_fn, d_means, d_quats, new_states)

    def bin_fn(proj):
        return jax.vmap(lambda p: _bin_gaussians(p, raster, tx, ty))(proj)

    binned = bench("bin_perenv", bin_fn, proj)

    opac = jnp.concatenate([st.opacities(), dyn.opacities()])

    def gather_fn(proj, colors):
        def one(p, c):
            return gather_tile_lists(p, c, opac, raster, tx, ty)
        return jax.vmap(one)(proj, colors)

    lists = bench("projbin+gather_perenv", gather_fn, proj, colors)
    (gxy, gconic, gcol, gop, gdepth), counts, _ = lists
    counts_np = np.asarray(counts)
    log(f"  per-env tile counts: mean={counts_np.mean():.0f} "
        f"max={counts_np.max()} "
        f"capped_mean={np.minimum(counts_np, cap).mean():.0f}")

    def comp_fn(gxy, gconic, gcol, gop, gdepth, counts):
        def one(xy, con, col, op, dep, cnt):
            return composite_dispatch(xy, con, col, op, dep, raster, tx,
                                      counts=cnt)
        return jax.vmap(one)(gxy, gconic, gcol, gop, gdepth, counts)

    bench("composite_f_perenv", comp_fn, gxy, gconic, gcol, gop, gdepth,
          counts)

    def comp_fb(gxy, gconic, gcol, gop, gdepth):
        def loss(xy, col, op):
            def one(xy1, con, col1, op1, dep, cnt):
                return composite_dispatch(xy1, con, col1, op1, dep, raster,
                                          tx, counts=cnt)
            rgb, da, tr = jax.vmap(one)(xy, gconic, col, op, gdepth, counts)
            return jnp.mean(rgb ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(gxy, gcol, gop)

    bench("composite_fb_perenv", comp_fb, gxy, gconic, gcol, gop, gdepth)

    # ---- full step (the bench moving variant) -------------------------
    step, _ = _make_step_moving(graph, RES, RES, raster)

    def loss_of(scene, states, actions):
        ns, imgs = jax.vmap(lambda s, a: step(scene, s, a))(states, actions)
        return jnp.mean(imgs ** 2), ns

    bench("step_fwd", lambda sc, s, a: loss_of(sc, s, a),
          scene, states, actions)

    def step_fb(sc, s, a):
        (loss, ns), grads = jax.value_and_grad(
            lambda sc_: loss_of(sc_, s, a), has_aux=True)(sc)
        return ns, loss, grads

    bench("step_fwdbwd", step_fb, scene, states, actions)

    res["_config"] = dict(B=B, N=N, RES=RES, cap=cap, backend=backend,
                          counts_mean=float(counts_np.mean()),
                          counts_max=int(counts_np.max()))
    if "step_fwdbwd" in res:
        log(f"\nfull fwd+bwd: {res['step_fwdbwd']:.2f} ms/batch = "
            f"{res['step_fwdbwd'] / B:.2f} ms/frame "
            f"({1e3 * B / res['step_fwdbwd']:.1f} f/s)")
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
