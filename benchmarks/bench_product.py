"""Product-path benchmark: BASELINE config 4 — articulated arm splat scene,
2 cameras (fixed viewport + moving EEF-mounted), driven END-TO-END through
``SplatEnvWrapperF`` (reference hot loop:
sim_a_splat/env/splat/splat_env_wrapper.py:140-159, which renders 2 cameras
per step, one attached to the EEF).

Invoked as a bench.py variant and standalone:
    python benchmarks/bench_product.py
Env overrides: BENCH_B, BENCH_N, BENCH_ITERS, PRODUCT_RES (h,w).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
URDF = REPO / "robot_description" / "pusharm6" / "urdf" / "pusharm6.urdf"


def build_product_wrapper(n_total=100_000, sh_degree=3, seed=0,
                          render_size=(240, 320), raster=None):
    """Arm env + splat wrapper at representative scale: per-link clusters
    at rest FK + task block + dominant static background, sh_degree 3."""
    import jax
    import jax.numpy as jnp
    from sim_a_splat_tpu.envs.manipulator_envs import ManipulatorEnvF
    from sim_a_splat_tpu.envs.splat_wrapper import CameraSpec, SplatEnvWrapperF
    from sim_a_splat_tpu.ops.sh import C0
    from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
    from sim_a_splat_tpu.ops.transforms import SE3
    from sim_a_splat_tpu.physics import kinematics as kin
    from sim_a_splat_tpu.splat.scene import GaussianScene

    chain = kin.load_chain(URDF)
    env = ManipulatorEnvF(chain=chain, eef_link="push_tool",
                          env_objects=True)
    rng = np.random.default_rng(seed)
    q_rest = jnp.zeros(6)
    rest_fk = kin.fk(chain, q_rest)
    n_links = rest_fk.q.shape[0]

    n_link = max(n_total // 50, 50)          # ~2% per link (xarm6-like)
    n_block = max(n_total // 25, 50)
    n_bg = n_total - n_links * n_link - n_block

    # scene built in pure numpy, shipped in ONE device_put (eager per-array
    # ops cost a remote round-trip + compile each on the tunneled platform)
    def cluster(center, n, color, spread):
        c = np.asarray(center, np.float32)
        q = rng.normal(size=(n, 4))
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        rgb = np.clip(color + rng.normal(0, 0.05, (n, 3)), 0, 1)
        return dict(
            means=rng.normal(size=(n, 3)) * spread + c,
            quats=q,
            log_scales=rng.uniform(np.log(0.004), np.log(0.012), (n, 3)),
            logit_opacities=np.full(n, 2.0, np.float32),
            sh_dc=(rgb - 0.5) / C0,      # rgb_to_sh, numpy
        )

    parts = [cluster([0.2, 0.0, -0.6], n_bg, [0.8, 0.8, 0.75], 0.8)]
    sizes = [n_bg]
    rest_t_np = np.asarray(rest_fk.t)
    for i in range(n_links):
        parts.append(cluster(rest_t_np[i], n_link, [0.3, 0.4, 0.8], 0.05))
        sizes.append(n_link)
    block_rest = np.asarray([0.45, 0.0, 0.0])
    parts.append(cluster(block_rest, n_block, [0.6, 0.55, 0.5], 0.06))
    sizes.append(n_block)

    def cat(k):
        return np.concatenate([p[k] for p in parts]).astype(np.float32)

    n = sum(sizes)
    k_rest = (sh_degree + 1) ** 2 - 1
    scene = jax.device_put(GaussianScene(
        cat("means"), cat("quats"), cat("log_scales"),
        cat("logit_opacities"), cat("sh_dc"),
        sh_rest=None if sh_degree == 0 else
        rng.normal(0, 0.02, (n, k_rest, 3)).astype(np.float32)))

    off = np.cumsum([0] + sizes)
    masks = {}
    for i in range(n_links):
        m = np.zeros(n, bool); m[off[i + 1]:off[i + 2]] = True
        masks[f"link{i}"] = m
    mt = np.zeros(n, bool); mt[off[-2]:off[-1]] = True
    masks["task"] = mt

    rest_q = jnp.concatenate([SE3.identity((1,)).q, rest_fk.q,
                              jnp.asarray([[1.0, 0, 0, 0]])])
    rest_t = jnp.concatenate([SE3.identity((1,)).t, rest_fk.t,
                              jnp.asarray(block_rest, jnp.float32)[None]])

    h, w = render_size
    cameras = {
        0: CameraSpec(type="viewport", render_size=(h, w),
                      local_frame=((1.0, 0, 0, 0), (0.4, -0.2, -1.6)),
                      fov=1.05),
        # EEF-mounted camera, world-axis offset (the reference
        # get_attached_frame convention, splat_handler.py:316-332)
        1: CameraSpec(type="moving", render_size=(h, w),
                      link_name="push_tool",
                      local_frame=((1.0, 0, 0, 0), (0.0, -0.15, -1.2)),
                      fov=1.05),
    }
    if raster is None:
        from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
        raster = RasterConfig(
            tile_capacity=1024, chunk=128, sigma_cutoff=3.0,
            backend="pallas", term_eps=1e-4,
            # measured footprints (viewport cam, /tmp scene probe): 51%
            # culled, mean nt 2.2, P90=4, P99=6, rare huge outliers
            buckets=((2, 0.70), (6, 0.20), (16, 0.10)))
    wrapper = SplatEnvWrapperF.build(
        env=env, scene=scene, link_masks=masks, camera_setup_info=cameras,
        task_mask_key="task", rest_poses_world=SE3(rest_q, rest_t),
        scene_frame="world", raster=raster)
    return wrapper


def measure_product(B=8, N=100_000, iters=5, render_size=(240, 320),
                    log=print, backend=None, sel_tiles=None,
                    dyn_capacity=None, R=None):
    """Compile + time the 2-camera wrapper ROLLOUT, fwd+bwd wrt the scene.
    Returns env-frames/s (each frame = physics step + 2 rendered cameras).

    Round 5: drives ``rollout_with_cache_batch`` — R control steps per
    call with the EEF camera on the frame-coherent candidate-cache path
    (ops/rasterize_moving.py), the reference's actual teleop hot loop
    (splat_env_wrapper.py:140-159) amortizing its per-frame binning."""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if backend is None:
        backend = "pallas" if dev.platform in ("tpu", "axon") else "xla"
    import dataclasses as _dc

    wrapper = build_product_wrapper(n_total=N, render_size=render_size)
    wrapper = _dc.replace(wrapper,
                          raster=wrapper.raster._replace(backend=backend))
    graph = wrapper.graph
    # the arm+block dynamics (18k gaussians) spread over most of the
    # 15×20-tile viewport and central tiles exceed 128 dynamic entries:
    # sel_tiles=160/dyn_cap=128 dropped tiles (overflow=352 in the first
    # r4 record); 256/256 covers it (overflow logged per run below).
    if sel_tiles is None:
        sel_tiles = int(os.environ.get("PRODUCT_SEL_TILES", "256"))
    if dyn_capacity is None:
        dyn_capacity = int(os.environ.get("PRODUCT_DYN_CAP", "256"))
    if R is None:
        R = int(os.environ.get("PRODUCT_R", "32"))
    margin = float(os.environ.get("PRODUCT_MARGIN", "16"))
    kc = int(os.environ.get("PRODUCT_KC", "512"))
    # near/far split: the EEF camera flies through the scene volume, so
    # content within z_split of the lens is re-binned per frame (exact)
    # instead of margin-budgeted (which diverges at the lens)
    z_split = float(os.environ.get("PRODUCT_ZSPLIT", "0.35"))
    near_cap = int(os.environ.get("PRODUCT_NEAR_CAP", "16384"))

    keys = jax.random.split(jax.random.key(0), B)
    reset_to = {"robot_pos": np.zeros(6),
                "block_pos": np.array([0.45, 0.0, 0.2, 0.0])}
    states, _ = jax.jit(jax.vmap(
        lambda k: wrapper.env.reset(k, reset_to)))(keys)
    base_action = jnp.asarray([0.0, 0.3, 0.4, 0.0, 0.4, 0.0], jnp.float32)

    # teleop-realistic load: settle the arm at the target first (the
    # reset→target transient swings the EEF through the scene — no frame
    # coherence exists there, for ANY renderer), then drive mm-scale
    # joint dither around the pose — human 10 Hz teleop moves the EEF
    # millimeters per control step (demo_pusht_splat.py:171)
    def warm(states):
        def body(s, _):
            tr = jax.vmap(wrapper.env.step)(
                s, jnp.tile(base_action, (B, 1)))
            return tr.state, None
        s, _ = jax.lax.scan(body, states, None, length=40)
        return s

    states = jax.jit(warm)(states)
    dither = float(os.environ.get("PRODUCT_DITHER", "0.004"))
    phase = jnp.sin(2 * jnp.pi * jnp.arange(R) / R)[:, None, None]
    pattern = jnp.asarray([0.0, 1.0, -1.0, 0.0, 1.0, 0.0], jnp.float32)
    actions_seq = jnp.broadcast_to(
        base_action[None, None] + dither * phase * pattern, (R, B, 6))

    def loss_of(scene, states, actions_seq):
        w = _dc.replace(wrapper, graph=graph._replace(scene=scene))
        caches = w.build_render_cache(scene)
        trs = w.rollout_with_cache_batch(
            states, actions_seq, caches, sel_tiles=sel_tiles,
            dyn_capacity=dyn_capacity, moving_margin=margin, moving_kc=kc,
            moving_z_split=z_split, moving_near_cap=near_cap)
        return (jnp.mean(trs.obs["camera_0"] ** 2)
                + jnp.mean(trs.obs["camera_1"] ** 2),
                (trs.state, trs.info["render_overflow"].max()))

    def fwd_bwd(scene, states, actions_seq):
        (loss, (ns, overflow)), grads = jax.value_and_grad(
            lambda sc: loss_of(sc, states, actions_seq), has_aux=True)(scene)
        return ns, loss, overflow, grads

    jitted = jax.jit(fwd_bwd, donate_argnums=(1,))
    log(f"[product] compiling... (B={B} N={N} res={render_size} R={R} "
        f"backend={backend} sel_tiles={sel_tiles} kc={kc})")
    t0 = time.time()
    states, loss, overflow, grads = jitted(graph.scene, states, actions_seq)
    jax.block_until_ready(loss)
    log(f"[product] compiled+first call in {time.time() - t0:.1f}s, "
        f"loss={float(loss):.5f} render_overflow={int(overflow)}")
    t0 = time.time()
    for _ in range(iters):
        states, loss, overflow, grads = jitted(graph.scene, states,
                                               actions_seq)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    frames = B * iters * R
    fps = frames / dt
    log(f"[product] {frames} env-frames (2 cams each) in {dt:.2f}s "
        f"→ {fps:.1f} frames/s (ms/frame {1e3 * dt / frames:.2f}) "
        f"steady-state overflow={int(overflow)}")
    return fps


def measure_latency(N=100_000, iters=10, render_size=(240, 320), log=print,
                    backend=None):
    """Teleop step latency: ONE env (B=1) step + 2-camera render, forward
    only, caches prebuilt outside the timed step (the scene does not change
    during teleop).  Returns post-compile milliseconds per step — the
    number the reference's 10 Hz human-in-the-loop clock cares about
    (demo_pusht_splat.py:171)."""
    import jax
    import jax.numpy as jnp
    import dataclasses as _dc

    dev = jax.devices()[0]
    if backend is None:
        backend = "pallas" if dev.platform in ("tpu", "axon") else "xla"
    wrapper = build_product_wrapper(n_total=N, render_size=render_size)
    wrapper = _dc.replace(wrapper,
                          raster=wrapper.raster._replace(backend=backend))
    sel_tiles = int(os.environ.get("PRODUCT_SEL_TILES", "256"))
    dyn_capacity = int(os.environ.get("PRODUCT_DYN_CAP", "256"))

    keys = jax.random.split(jax.random.key(0), 1)
    reset_to = {"robot_pos": np.zeros(6),
                "block_pos": np.array([0.45, 0.0, 0.2, 0.0])}
    states, _ = jax.jit(jax.vmap(
        lambda k: wrapper.env.reset(k, reset_to)))(keys)
    actions = jnp.tile(jnp.asarray(
        [0.0, 0.3, 0.4, 0.0, 0.4, 0.0], jnp.float32), (1, 1))
    caches = jax.jit(wrapper.build_render_cache)(wrapper.graph.scene)
    jax.block_until_ready(caches)

    # settle the arm (the reset transient has no frame coherence), then
    # prebuild the EEF camera's candidate cache — in the teleop loop the
    # host rebuilds it whenever camera_budget_used approaches 1, amortized
    # over many 10 Hz steps; the rebuild cost is reported separately
    @jax.jit
    def settle(states):
        def body(s, _):
            return jax.vmap(wrapper.env.step)(s, actions).state, None
        return jax.lax.scan(body, states, None, length=120)[0]

    states = settle(states)
    base = wrapper._base_env()
    margin = float(os.environ.get("PRODUCT_MARGIN", "16"))
    kc = int(os.environ.get("PRODUCT_KC", "512"))
    z_split = float(os.environ.get("PRODUCT_ZSPLIT", "0.35"))
    near_cap = int(os.environ.get("PRODUCT_NEAR_CAP", "16384"))

    @jax.jit
    def build_moving(states):
        draws = jax.vmap(base.draw_state)(states)
        return wrapper.build_moving_caches(
            draws, margin=margin, kc=kc, z_split=z_split, near_cap=near_cap)

    t0 = time.time()
    mcaches = build_moving(states)
    jax.block_until_ready(mcaches)
    t0 = time.time()
    mcaches = build_moving(states)
    jax.block_until_ready(mcaches)
    rebuild_ms = 1e3 * (time.time() - t0)

    @jax.jit
    def step(states, actions):
        tr = wrapper.step_with_cache_batch(states, actions, caches,
                                           sel_tiles=sel_tiles,
                                           dyn_capacity=dyn_capacity,
                                           moving_caches=mcaches)
        return (tr.state, tr.obs["camera_0"], tr.obs["camera_1"],
                tr.info["render_overflow"][0])

    log(f"[latency] compiling... (B=1 {render_size} 2 cams fwd)")
    t0 = time.time()
    states, c0, c1, over = step(states, actions)
    jax.block_until_ready(c0)
    log(f"[latency] compiled+first step in {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        states, c0, c1, over = step(states, actions)
    jax.block_until_ready(c0)
    ms = 1e3 * (time.time() - t0) / iters
    log(f"[latency] {ms:.1f} ms/step (B=1, fwd, 2×{render_size}, "
        f"severe={int(over)}; moving-cache rebuild {rebuild_ms:.0f} ms "
        "when the budget nears 1)")
    return ms


if __name__ == "__main__":
    import json

    B = int(os.environ.get("BENCH_B", "8"))
    N = int(os.environ.get("BENCH_N", "100000"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    fps = measure_product(B=B, N=N, iters=iters,
                          log=lambda m: print(m, file=sys.stderr, flush=True))
    print(json.dumps({
        "metric": "arm_splat_wrapper_2cam_240x320_fwdbwd",
        "value": round(fps, 2), "unit": "env_frames/s/chip"}))
