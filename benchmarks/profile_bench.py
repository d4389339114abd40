"""Component-level profile of the bench hot path (the cached env step).

Times each stage of ``bench.py``'s fwd+bwd frame in isolation on the real
device, with ``block_until_ready`` between stages, so the 19 ms/frame of
round 1 can be attributed.  Writes ``PROFILE.md``-ready numbers to stderr
and one JSON summary to stdout.

Stages (per *batch* of B envs unless noted):
  physics        vmapped pusht.control_step
  pose_dyn       scene-graph posing of the dynamic gaussians
  project_dyn    EWA projection of the dynamic set
  bin_dyn        tile binning (global (tile, depth) sort) of the dynamic set
  merge          merge_sorted_lists: the (T, K_s+K_d) 12-operand lax.sort
  composite_f    pallas forward compositing of merged lists
  prepare        static-scene projection+binning (once per train step)
  step_fwd       the full cached step, forward only
  step_fwdbwd    the full cached step, value_and_grad (the bench metric)

Usage: python benchmarks/profile_bench.py  [env overrides as bench.py]
"""

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene, _make_step_cached
    from sim_a_splat_tpu.ops import SE3, Camera, quaternion as quat
    from sim_a_splat_tpu.ops.projection import project
    from sim_a_splat_tpu.ops.rasterize_cached import (
        TileCache, build_tile_cache, merge_sorted_lists,
    )
    from sim_a_splat_tpu.ops.rasterize_tiles import (
        RasterConfig, composite_dispatch, gather_tile_lists,
    )
    from sim_a_splat_tpu.physics import PushTParams, pusht
    from sim_a_splat_tpu.utils.profiling import time_jitted

    B = int(os.environ.get("BENCH_B", "8"))
    N = int(os.environ.get("BENCH_N", "100000"))
    RES = int(os.environ.get("BENCH_RES", "256"))
    cap = int(os.environ.get("BENCH_TILE_CAP", "1024"))
    dyn_cap = int(os.environ.get("BENCH_DYN_CAP", "128"))
    term = float(os.environ.get("BENCH_TERM", "1e-4"))
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    dev = jax.devices()[0]
    log(f"profile: device={dev.platform}/{dev.device_kind} B={B} N={N} "
        f"res={RES} cap={cap} dyn_cap={dyn_cap} backend={backend}")

    n_block = max(N // 20, 100)
    n_agent = max(N // 50, 50)
    graph = _build_scene(n_bg=N - n_block - n_agent, n_block=n_block,
                         n_agent=n_agent, seed=0)
    raster = RasterConfig(tile_size=16, tile_capacity=cap,
                          max_tiles_per_gaussian=16, chunk=128,
                          sigma_cutoff=3.0, backend=backend,
                          term_eps=term if term > 0 else None)

    P = PushTParams()
    cam = Camera.from_fov(
        SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([149.0, 256.0, -450.0])),
        1.05, RES, RES)
    ts = raster.tile_size
    tx = -(-RES // ts)
    ty = -(-RES // ts)

    ids = np.asarray(graph.link_ids)
    stat_idx = jnp.asarray(np.where(ids == 0)[0], jnp.int32)
    dyn_idx = jnp.asarray(np.where(ids > 0)[0], jnp.int32)
    dyn_ids = jnp.asarray(ids[ids > 0], jnp.int32)
    scene = graph.scene

    log("setup: resetting envs...")
    keys = jax.random.split(jax.random.key(0), B)
    states = jax.jit(jax.vmap(lambda k: pusht.reset(P, k)))(keys)
    actions = jnp.tile(jnp.asarray([150.0, 250.0], jnp.float32), (B, 1))
    jax.block_until_ready(states)
    log("setup done")

    res = {}

    only = os.environ.get("PROFILE_ONLY", "")  # comma-set of substrings
    # stages whose outputs feed later stages must still execute when
    # filtered out; pure-measurement stages can be skipped entirely
    _feeders = {"physics", "pose_dyn", "project_dyn", "bin_dyn", "prepare",
                "merge"}

    def bench(name, fn, *args, **kw):
        if only and not any(s in name for s in only.split(",")):
            if name in _feeders:
                log(f"[{name}] untimed (PROFILE_ONLY)")
                return jax.jit(fn)(*args)
            log(f"[{name}] skipped (PROFILE_ONLY)")
            return None
        log(f"[{name}] compiling...")
        s, out = time_jitted(fn, *args, iters=iters, warmup=2, name=None)
        res[name] = round(s * 1e3, 3)
        log(f"{name:16s} {s * 1e3:8.3f} ms")
        return out

    # ---- stage inputs -------------------------------------------------
    def physics_fn(states, actions):
        return jax.vmap(lambda s, a: pusht.control_step(P, s, a))(
            states, actions)

    new_states = bench("physics", physics_fn, states, actions)

    def pose2d(xy, angle):
        return (quat.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), angle),
                jnp.concatenate([xy, jnp.zeros(1)]))

    def pose_dyn_one(scene, state):
        qb, tb = pose2d(state.block_pos, state.block_angle)
        qa, ta = pose2d(state.agent_pos, jnp.zeros(()))
        body_poses = SE3(jnp.stack([jnp.asarray([1.0, 0, 0, 0]), qb, qa]),
                         jnp.stack([jnp.zeros(3), tb, ta]))
        rel = body_poses.compose(graph.rest_inv)
        dyn = scene.select(dyn_idx)
        q_g = rel.q[dyn_ids]
        t_g = rel.t[dyn_ids]
        dyn = dyn._replace(means=quat.rotate(q_g, dyn.means) + t_g,
                           quats=quat.multiply(q_g, dyn.quats))
        return dyn.means, dyn.covs(), dyn.colors_dc(), dyn.opacities()

    def pose_dyn_fn(scene, states):
        return jax.vmap(lambda s: pose_dyn_one(scene, s))(states)

    d_means, d_covs, d_cols, d_ops = bench(
        "pose_dyn", pose_dyn_fn, scene, new_states)

    def project_fn(means, covs):
        return jax.vmap(lambda m, c: project(m, c, cam))(means, covs)

    proj = bench("project_dyn", project_fn, d_means, d_covs)

    dyn_cfg = raster._replace(tile_capacity=dyn_cap)

    def bin_fn(proj, cols, ops):
        def one(p, c, o):
            (gxy, gconic, gcol, gop, gdep), cnt, tr = gather_tile_lists(
                p, c, o, dyn_cfg, tx, ty)
            return TileCache(gxy, gconic, gcol, gop, gdep, cnt)
        return jax.vmap(one)(proj, cols, ops)

    dyn_lists = bench("bin_dyn", bin_fn, proj, d_cols, d_ops)

    def prepare_fn(scene):
        st = scene.select(stat_idx)
        return build_tile_cache(st.means, st.covs(), st.colors_dc(),
                                st.opacities(), cam, raster)

    cache = bench("prepare", prepare_fn, scene)
    log(f"  static counts: max={int(jnp.max(cache.counts))} "
        f"mean={float(jnp.mean(cache.counts)):.0f} "
        f"p90={int(jnp.percentile(cache.counts, 90))}")
    log(f"  dyn counts:    max={int(jnp.max(dyn_lists.counts))} "
        f"mean={float(jnp.mean(dyn_lists.counts)):.1f}")

    def merge_fn(cache, dyn_lists):
        return jax.vmap(lambda d: merge_sorted_lists(cache, d))(dyn_lists)

    merged = bench("merge", merge_fn, cache, dyn_lists)

    # merge sub-stages (forward only)
    def merge_counts(cache, dyn_lists):
        def one(d):
            skey = jnp.where(cache.gop > 0.0, cache.gdepth, jnp.inf)
            dkey = jnp.where(d.gop > 0.0, d.gdepth, jnp.inf)
            cnt_d = jnp.sum(dkey[:, None, :] < skey[:, :, None], axis=2,
                            dtype=jnp.int32)
            cnt_s = jnp.sum(skey[:, None, :] <= dkey[:, :, None], axis=2,
                            dtype=jnp.int32)
            return cnt_d, cnt_s
        return jax.vmap(one)(dyn_lists)

    bench("merge/counts", merge_counts, cache, dyn_lists)

    def merge_intsort(cache, dyn_lists):
        from jax import lax
        def one(d):
            Ks = cache.gop.shape[1]
            Kd = d.gop.shape[1]
            T = cache.gop.shape[0]
            dest = jnp.broadcast_to(
                jnp.arange(Ks + Kd, dtype=jnp.int32), (T, Ks + Kd))
            dest = dest + (d.counts[:, None] % 7)  # defeat constant folding
            iota = jnp.broadcast_to(
                jnp.arange(Ks + Kd, dtype=jnp.int32), dest.shape)
            _, perm = lax.sort((dest, iota), dimension=1, num_keys=1)
            return perm
        return jax.vmap(one)(dyn_lists)

    bench("merge/intsort", merge_intsort, cache, dyn_lists)

    def composite_fn(merged):
        def one(m):
            return composite_dispatch(m.gxy, m.gconic, m.gcol, m.gop,
                                      m.gdepth, raster, tx, counts=m.counts)
        return jax.vmap(one)(merged)

    bench("composite_f", composite_fn, merged)

    def composite_fb(merged):
        def loss(floats, counts):
            def one(gxy, gconic, gcol, gop, gdepth, cnt):
                rgb, _, _ = composite_dispatch(
                    gxy, gconic, gcol, gop, gdepth, raster, tx, counts=cnt)
                return jnp.mean(rgb ** 2)
            return jnp.mean(jax.vmap(one)(*floats, counts))
        floats = (merged.gxy, merged.gconic, merged.gcol, merged.gop,
                  merged.gdepth)
        return jax.value_and_grad(loss)(floats, merged.counts)

    bench("composite_fb", composite_fb, merged)

    def merge_comp_fb(cache_floats, ccounts, dyn_floats, dcounts):
        def loss(cf, df):
            c = TileCache(*cf, ccounts)
            def one(*dleaves):
                d = TileCache(*dleaves[:-1], dleaves[-1])
                m = merge_sorted_lists(c, d)
                rgb, _, _ = composite_dispatch(
                    m.gxy, m.gconic, m.gcol, m.gop, m.gdepth, raster, tx,
                    counts=m.counts)
                return jnp.mean(rgb ** 2)
            return jnp.mean(jax.vmap(one)(*df, dcounts))
        return jax.value_and_grad(loss, argnums=(0, 1))(
            cache_floats, dyn_floats)

    bench("merge+comp_fb", merge_comp_fb,
          (cache.gxy, cache.gconic, cache.gcol, cache.gop, cache.gdepth),
          cache.counts,
          (dyn_lists.gxy, dyn_lists.gconic, dyn_lists.gcol, dyn_lists.gop,
           dyn_lists.gdepth),
          dyn_lists.counts)

    def prepare_fb(scene):
        def loss(sc):
            c = prepare_fn(sc)
            return (jnp.mean(c.gcol ** 2) + jnp.mean(c.gxy ** 2)
                    + jnp.mean(c.gop ** 2))
        return jax.value_and_grad(loss)(scene)

    bench("prepare_fb", prepare_fb, scene)

    def bin_fb(means, covs, cols, ops):
        def loss(m, c, co, o):
            def one(mm, cc, cco, oo):
                p = project(mm, cc, cam)
                (gxy, gconic, gcol, gop, gdep), cnt, tr = gather_tile_lists(
                    p, cco, oo, dyn_cfg, tx, ty)
                return (jnp.mean(gcol ** 2) + jnp.mean(gxy ** 2)
                        + jnp.mean(gop ** 2))
            return jnp.mean(jax.vmap(one)(m, c, co, o))
        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(means, covs, cols, ops)

    bench("projbin_fb", bin_fb, d_means, d_covs, d_cols, d_ops)

    # ---- full step ----------------------------------------------------
    prepare, step_c, _ = _make_step_cached(graph, RES, RES, raster,
                                           dyn_capacity=dyn_cap)

    def loss_of(scene, states, actions):
        cache = prepare(scene)
        new_states, imgs = jax.vmap(
            lambda s, a: step_c(cache, scene, s, a))(states, actions)
        return jnp.mean(imgs ** 2), new_states

    def step_fwd(scene, states, actions):
        return loss_of(scene, states, actions)

    bench("step_fwd", step_fwd, scene, states, actions)

    def step_fwdbwd(scene, states, actions):
        (loss, ns), grads = jax.value_and_grad(
            lambda sc: loss_of(sc, states, actions), has_aux=True)(scene)
        return ns, loss, grads

    bench("step_fwdbwd", step_fwdbwd, scene, states, actions)

    res["_config"] = dict(B=B, N=N, RES=RES, cap=cap, dyn_cap=dyn_cap,
                          backend=backend,
                          ms_per_frame_fwdbwd=res["step_fwdbwd"] / B)
    log(f"\nfull fwd+bwd: {res['step_fwdbwd']:.2f} ms/batch "
        f"= {res['step_fwdbwd'] / B:.2f} ms/frame "
        f"({1e3 * B / res['step_fwdbwd']:.1f} f/s)")
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
