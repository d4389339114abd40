"""Stage profile of the round-5 moving-camera CANDIDATE-CACHE path.

Complements profile_moving.py (the full-rebin baseline): times the cache
build (amortized once per R-frame rollout chunk), the per-frame candidate
reprojection + per-tile depth re-sort, the per-frame dynamic binning, and
the per-env-static selected-tile composite — so the rollout parameters
(R, margin, kc) are chosen from measured stages.

Usage: python benchmarks/profile_moving_cached.py
Env: BENCH_B, BENCH_N, BENCH_RES, MOVING_MARGIN, MOVING_KC, BENCH_ITERS.
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

    from __graft_entry__ import _build_scene
    from sim_a_splat_tpu.ops import Camera, SE3, quaternion as quat
    from sim_a_splat_tpu.ops import sh as sh_ops
    from sim_a_splat_tpu.ops.projection import view_directions
    from sim_a_splat_tpu.ops.rasterize_moving import (
        build_moving_cache, camera_budget_used, dilated_build_config,
        render_moving_batch, reproject_candidates,
    )
    from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
    from sim_a_splat_tpu.physics import PushTParams, pusht
    from sim_a_splat_tpu.utils.profiling import time_jitted

    B = int(os.environ.get("BENCH_B", "16"))
    N = int(os.environ.get("BENCH_N", "100000"))
    RES = int(os.environ.get("BENCH_RES", "256"))
    MARGIN = float(os.environ.get("MOVING_MARGIN", "16"))
    KC = int(os.environ.get("MOVING_KC", "2048"))
    term = float(os.environ.get("BENCH_TERM", "1e-4"))
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    dev = jax.devices()[0]
    log(f"profile_moving_cached: device={dev.platform} B={B} N={N} res={RES} "
        f"margin={MARGIN} kc={KC} backend={backend}")

    n_block = max(N // 20, 100)
    n_agent = max(N // 50, 50)
    graph = _build_scene(n_bg=N - n_block - n_agent, n_block=n_block,
                         n_agent=n_agent, seed=0, sh_degree=3)
    raster = RasterConfig(tile_size=16, tile_capacity=1024,
                          max_tiles_per_gaussian=16, chunk=128,
                          sigma_cutoff=3.0, backend=backend,
                          term_eps=term if term > 0 else None,
                          buckets=((4, 0.80), (9, 0.12), (16, 0.08)))
    bcfg = dilated_build_config(raster, MARGIN)
    log(f"build config: buckets={bcfg.buckets} M={bcfg.max_tiles_per_gaussian}")

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
    sh_flat = st.sh_coeffs().reshape(st.means.shape[0], -1)

    res = {}

    def bench(name, fn, *args):
        log(f"[{name}] compiling...")
        s, out = time_jitted(fn, *args, iters=iters, warmup=2, name=None)
        res[name] = round(s * 1e3, 3)
        log(f"{name:26s} {s * 1e3:9.3f} ms")
        return out

    def cam_of(state):
        cam_t = jnp.concatenate([state.agent_pos, jnp.zeros(1)]) + \
            jnp.asarray([0.0, -40.0, -420.0])
        return Camera.from_fov(SE3(jnp.asarray([1.0, 0, 0, 0]), cam_t),
                               1.05, RES, RES)

    # agent motion per control step (margin budget reality check)
    def motion_fn(states, actions):
        ns = jax.vmap(lambda s, a: pusht.control_step(P, s, a))(states,
                                                               actions)
        return ns, jnp.linalg.norm(ns.agent_pos - states.agent_pos, axis=-1)

    sts = states
    deltas = []
    mj = jax.jit(motion_fn)
    for _ in range(8):
        sts, d = mj(sts, actions)
        deltas.append(np.asarray(d))
    deltas = np.stack(deltas)
    log(f"agent |Δxy|/step: mean={deltas.mean():.2f}px max={deltas.max():.2f}"
        f"px (world px; screen shift ≈ 0.53×)")
    res["agent_step_px_mean"] = round(float(deltas.mean()), 2)
    res["agent_step_px_max"] = round(float(deltas.max()), 2)

    # ---- build (once per rollout chunk) ------------------------------
    def build_fn(st_means, states):
        def one(state):
            return build_moving_cache(
                st_means, st.quats, st.log_scales, sh_flat, st.opacities(),
                cam_of(state), bcfg, kc=KC, margin=MARGIN)
        return jax.vmap(one)(states)

    caches = bench("build_cache_f", build_fn, st.means, states)
    counts_np = np.asarray(caches.counts)
    log(f"  candidate counts: mean={counts_np.mean():.0f} "
        f"max={counts_np.max()} build_trunc={np.asarray(caches.n_build_truncated).sum()}")

    def build_fb(st_means, states):
        def loss(m):
            c = build_fn(m, states)
            return jnp.mean(c.mean ** 2) + jnp.mean(c.sh ** 2)
        return jax.value_and_grad(loss)(st_means)

    bench("build_cache_fb", build_fb, st.means, states)

    # ---- per-frame stages --------------------------------------------
    cams = jax.jit(jax.vmap(cam_of))(states)

    def reproject_fn(caches, cams):
        return jax.vmap(
            lambda c, cm: reproject_candidates(c, cm, 3, raster))(caches,
                                                                  cams)

    bench("reproject+sort_f", reproject_fn, caches, cams)

    def reproject_fb(caches, cams):
        def loss(mean, sh):
            spay, _ = reproject_fn(
                caches._replace(mean=mean, sh=sh), cams)
            return jnp.mean(spay ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1))(caches.mean,
                                                        caches.sh)

    bench("reproject+sort_fb", reproject_fb, caches, cams)

    def pose2d(xy, angle):
        return (quat.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), angle),
                jnp.concatenate([xy, jnp.zeros(1)]))

    def frame_fn(caches, states, actions):
        ns = jax.vmap(lambda s, a: pusht.control_step(P, s, a))(states,
                                                                actions)

        def pose_one(state):
            qb, tb = pose2d(state.block_pos, state.block_angle)
            qa, ta = pose2d(state.agent_pos, jnp.zeros(()))
            body = SE3(jnp.stack([jnp.asarray([1.0, 0, 0, 0]), qb, qa]),
                       jnp.stack([jnp.zeros(3), tb, ta]))
            rel = body.compose(graph.rest_inv)
            q_g, t_g = rel.q[dyn_ids], rel.t[dyn_ids]
            m = quat.rotate(q_g, dyn.means) + t_g
            q = quat.multiply(q_g, dyn.quats)
            cam = cam_of(state)
            dirs = view_directions(m, cam)
            cols = sh_ops.eval_sh_color_split(dyn.sh_dc, dyn.sh_rest, dirs, 3)
            return m, q, cols

        d_means, d_quats, d_cols = jax.vmap(pose_one)(ns)
        cams = jax.vmap(cam_of)(ns)
        Bv = d_means.shape[0]
        d_ls = jnp.broadcast_to(dyn.log_scales, (Bv,) + dyn.log_scales.shape)
        d_op = jnp.broadcast_to(dyn.opacities(), (Bv,) + dyn.opacities().shape)
        imgs, aux = render_moving_batch(
            caches, cams, d_means, d_quats, d_ls, d_cols, d_op, raster, 3,
            dyn_capacity=128, dyn_max_tiles=9)
        viol = jnp.sum(jax.vmap(
            lambda c, cm: camera_budget_used(c, cm))(caches, cams) > 1.0)
        return ns, imgs, viol

    ns, imgs, viol = bench("frame_f", frame_fn, caches, states, actions)
    log(f"  margin violations first frame: {int(viol)}")

    def frame_fb(caches, states, actions):
        def loss(mean, sh):
            ns, imgs, _ = frame_fn(caches._replace(mean=mean, sh=sh),
                                   states, actions)
            return jnp.mean(imgs ** 2), ns
        (l, ns), g = jax.value_and_grad(loss, has_aux=True,
                                        argnums=(0, 1))(caches.mean,
                                                        caches.sh)
        return ns, l, g

    bench("frame_fb", frame_fb, caches, states, actions)

    res["_config"] = dict(B=B, N=N, RES=RES, margin=MARGIN, kc=KC,
                          counts_mean=float(counts_np.mean()),
                          counts_max=int(counts_np.max()))
    # projected rollout rate at R frames/chunk
    for R in (4, 8, 16, 32):
        if "build_cache_fb" in res and "frame_fb" in res:
            ms = res["build_cache_fb"] / R + res["frame_fb"]
            res[f"proj_fps_R{R}"] = round(1e3 * B / ms, 1)
            log(f"  projected fwd+bwd @ R={R}: {ms:.1f} ms/frame-batch "
                f"→ {res[f'proj_fps_R{R}']} f/s")
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
