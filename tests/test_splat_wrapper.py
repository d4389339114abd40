"""Splat env wrapper: camera_{i} obs contract, camera ordering, link-bound
splat motion (functional twin of reference tests/test_splat_wrapper.py —
with assertions instead of an infinite random walk)."""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.envs.manipulator_envs import ManipulatorEnvF
from sim_a_splat_tpu.envs.splat_wrapper import CameraSpec, SplatEnvWrapperF
from sim_a_splat_tpu.ops import quaternion as quat, rgb_to_sh
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.physics import kinematics as kin
from sim_a_splat_tpu.splat.scene import GaussianScene

PLANAR = Path(__file__).parent / "assets" / "planar2.urdf"


def cluster(center, n, color, rng, spread=0.04):
    xy = rng.normal(size=(n, 3)) * spread + np.asarray(center)
    return dict(
        means=xy,
        quats=np.tile([1.0, 0, 0, 0], (n, 1)),
        log_scales=np.full((n, 3), np.log(0.02)),
        logit_opacities=np.full(n, 2.0),
        sh_dc=np.asarray(rgb_to_sh(jnp.tile(jnp.asarray(color), (n, 1)))),
    )


def build_wrapper(env_objects=True):
    chain = kin.load_chain(PLANAR)
    env = ManipulatorEnvF(chain=chain, eef_link="tool",
                          env_objects=env_objects)
    rng = np.random.default_rng(0)
    q_rest = jnp.zeros(2)
    rest_fk = kin.fk(chain, q_rest)

    # one splat cluster per robot link at its rest FK position + block + bg
    parts, masks_list = [], []
    colors = [[0.8, 0.2, 0.2], [0.2, 0.8, 0.2], [0.2, 0.2, 0.8],
              [0.8, 0.8, 0.2]]
    for i in range(4):
        parts.append(cluster(np.asarray(rest_fk.t[i]), 50, colors[i], rng))
    block_rest = np.asarray([0.45, 0.0, 0.0])
    parts.append(cluster(block_rest, 60, [0.6, 0.6, 0.6], rng))
    parts.append(cluster([0.0, 0.0, -0.3], 100, [0.9, 0.9, 0.9], rng, 0.5))

    def cat(k):
        return jnp.asarray(np.concatenate([p[k] for p in parts]), jnp.float32)

    scene = GaussianScene(cat("means"), cat("quats"), cat("log_scales"),
                          cat("logit_opacities"), cat("sh_dc"))
    sizes = [50, 50, 50, 50, 60, 100]
    off = np.cumsum([0] + sizes)
    n = off[-1]
    masks = {}
    for i in range(4):
        m = np.zeros(n, bool); m[off[i]:off[i + 1]] = True
        masks[f"link{i}"] = m
    mt = np.zeros(n, bool); mt[off[4]:off[5]] = True
    masks["task"] = mt

    # rest poses: robot links at FK(q_rest), block at its rest position
    rest_q = jnp.concatenate([SE3.identity((1,)).q, rest_fk.q,
                              jnp.asarray([[1.0, 0, 0, 0]])])
    rest_t = jnp.concatenate([SE3.identity((1,)).t, rest_fk.t,
                              jnp.asarray(block_rest)[None]])
    cameras = {
        0: CameraSpec(type="viewport", render_size=(48, 64),
                      local_frame=((1.0, 0, 0, 0), (0.3, 0.0, -2.0)),
                      fov=0.9),
        1: CameraSpec(type="moving", render_size=(32, 32),
                      link_name="tool",
                      local_frame=((1.0, 0, 0, 0), (0.0, 0.0, -1.0)),
                      fov=0.9),
    }
    wrapper = SplatEnvWrapperF.build(
        env=env, scene=scene, link_masks=masks,
        camera_setup_info=cameras, task_mask_key="task" if env_objects else None,
        rest_poses_world=SE3(rest_q, rest_t), scene_frame="world",
        raster=RasterConfig(tile_capacity=256, chunk=64, sigma_cutoff=3.0),
    )
    return wrapper, chain


def test_obs_contract_and_camera_order():
    wrapper, _ = build_wrapper()
    state, obs = wrapper.reset(jax.random.key(0), {
        "robot_pos": np.zeros(2),
        "block_pos": np.array([0.45, 0.0, 0.2, 0.0]),
    })
    # moving camera first (render_cam_keys order) → camera_0 is 32×32
    assert obs["camera_0"].shape == (3, 32, 32)
    assert obs["camera_1"].shape == (3, 48, 64)
    assert "robot_joint_pos" in obs
    for k in ("camera_0", "camera_1"):
        assert np.isfinite(np.asarray(obs[k])).all()


def test_robot_splats_move_with_joints():
    wrapper, _ = build_wrapper()
    state, obs0 = wrapper.reset(jax.random.key(0), {
        "robot_pos": np.zeros(2),
        "block_pos": np.array([0.45, 0.2, 0.2, 0.0]),
    })
    step = jax.jit(lambda s, a: wrapper.step(s, a))
    tr = step(state, jnp.asarray([0.0, 0.0]))
    img_still = np.asarray(tr.obs["camera_1"])
    for _ in range(30):
        tr = step(tr.state, jnp.asarray([1.2, 0.8]))
    img_moved = np.asarray(tr.obs["camera_1"])
    assert np.abs(img_moved - img_still).mean() > 1e-3
    # static background cluster must not move: camera_1 is fixed, so check
    # pixels far from any robot cluster stay identical
    # (coarse: total image change is bounded, not total)
    assert np.abs(img_moved - img_still).mean() < 0.5


def test_moving_camera_tracks_link():
    wrapper, chain = build_wrapper()
    state, _ = wrapper.reset(jax.random.key(1), {
        "robot_pos": np.zeros(2),
        "block_pos": np.array([0.45, 0.0, 0.2, 0.0]),
    })
    base = wrapper._base_env()
    draw = base.draw_state(state)
    poses = wrapper.camera_poses(state, draw)
    tool_idx = chain.link_index("tool")
    link_t = np.asarray(draw.poses.t[tool_idx])
    # offset added in world axes (reference quirk)
    np.testing.assert_allclose(np.asarray(poses[0].t),
                               link_t + np.array([0, 0, -1.0]), atol=1e-5)


def test_noobs_skips_render():
    wrapper, _ = build_wrapper()
    state, _ = wrapper.reset(jax.random.key(0), {
        "robot_pos": np.zeros(2),
        "block_pos": np.array([0.45, 0.0, 0.2, 0.0]),
    })
    tr = wrapper.step(state, jnp.asarray([0.1, 0.1]), noobs=True)
    assert "camera_0" not in tr.obs


def test_render_with_cache_matches_full():
    """The cached product render (static tile cache + fused pair kernel for
    fixed cameras, raw full rebin for moving) must match the plain
    full-rebin render on every camera."""
    wrapper, _ = build_wrapper()
    state, _ = wrapper.reset(jax.random.key(0), {
        "robot_pos": np.zeros(2),
        "block_pos": np.array([0.45, 0.1, 0.2, 0.3]),
    })
    tr = wrapper.env.step(state, jnp.asarray([0.1, -0.1]))
    full = wrapper.render(tr.state)
    caches = wrapper.build_render_cache()
    cached = wrapper.render_with_cache(tr.state, caches)
    assert len(full) == len(cached) == 2
    for a, b in zip(full, cached):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)


def _batch_reset(wrapper, B=2):
    states = []
    for b in range(B):
        s, _ = wrapper.env.reset(jax.random.key(b), {
            "robot_pos": np.asarray([0.1 * b, -0.05 * b]),
            "block_pos": np.array([0.45, 0.1 * b, 0.2, 0.3 * b]),
        })
        states.append(s)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


@pytest.mark.slow
def test_step_with_cache_batch_matches_per_env():
    """The batched selected-tile product path must reproduce the per-env
    cached path (images and info contract) — the round-4 wiring of the
    sel kernel into SplatEnvWrapperF.  Slow-marked (41 s): the stepwise
    rollout test covers the batched/per-env equivalence in the core
    suite, and the grads twin below is already slow."""
    import dataclasses

    wrapper, _ = build_wrapper()
    wrapper = dataclasses.replace(
        wrapper, raster=RasterConfig(tile_capacity=128, chunk=128,
                                     sigma_cutoff=3.0,
                                     backend="pallas_interpret"))
    states = _batch_reset(wrapper, B=2)
    actions = jnp.asarray([[0.1, -0.1], [0.4, 0.2]])
    caches = wrapper.build_render_cache()

    trb = wrapper.step_with_cache_batch(states, actions, caches,
                                        sel_tiles=12)
    assert int(trb.info["render_overflow"][0]) == 0
    for b in range(2):
        s_b = jax.tree.map(lambda x: x[b], states)
        tr = wrapper.step_with_cache(s_b, actions[b], caches)
        for k in ("camera_0", "camera_1"):
            np.testing.assert_allclose(np.asarray(trb.obs[k][b]),
                                       np.asarray(tr.obs[k]),
                                       atol=5e-5, rtol=1e-4)
        np.testing.assert_allclose(float(trb.reward[b]), float(tr.reward),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_step_with_cache_batch_grads_match_per_env():
    import dataclasses

    wrapper, _ = build_wrapper()
    wrapper = dataclasses.replace(
        wrapper, raster=RasterConfig(tile_capacity=128, chunk=128,
                                     sigma_cutoff=3.0,
                                     backend="pallas_interpret"))
    states = _batch_reset(wrapper, B=2)
    actions = jnp.asarray([[0.1, -0.1], [0.4, 0.2]])

    def loss_batch(scene):
        import dataclasses as dc
        w = dc.replace(wrapper, graph=wrapper.graph._replace(scene=scene))
        caches = w.build_render_cache(scene)
        tr = w.step_with_cache_batch(states, actions, caches, sel_tiles=12)
        return sum(jnp.mean(tr.obs[k] ** 2)
                   for k in ("camera_0", "camera_1"))

    def loss_per_env(scene):
        import dataclasses as dc
        w = dc.replace(wrapper, graph=wrapper.graph._replace(scene=scene))
        caches = w.build_render_cache(scene)
        tot = 0.0
        for b in range(2):
            s_b = jax.tree.map(lambda x: x[b], states)
            tr = w.step_with_cache(s_b, actions[b], caches)
            tot = tot + sum(jnp.mean(tr.obs[k] ** 2)
                            for k in ("camera_0", "camera_1")) / 2
        return tot

    gb = jax.grad(loss_batch)(wrapper.graph.scene)
    gp = jax.grad(loss_per_env)(wrapper.graph.scene)
    for a, b in zip(gb, gp):
        if a is None:
            continue
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=max(5e-3 * scale, 1e-7), rtol=2e-2)


def test_step_with_cache_batch_surfaces_overflow():
    """A deliberately tiny sel_tiles must show up in info['render_overflow']
    (never silent image/grad degradation — VERDICT r3 #8)."""
    import dataclasses

    wrapper, _ = build_wrapper()
    wrapper = dataclasses.replace(
        wrapper, raster=RasterConfig(tile_capacity=128, chunk=128,
                                     sigma_cutoff=3.0,
                                     backend="pallas_interpret"))
    states = _batch_reset(wrapper, B=2)
    actions = jnp.zeros((2, 2))
    caches = wrapper.build_render_cache()
    tr = wrapper.step_with_cache_batch(states, actions, caches, sel_tiles=1)
    assert int(tr.info["render_overflow"][0]) > 0


@pytest.mark.slow
def test_step_with_cache_batch_xla_fallback():
    """With a non-pallas backend the batch path falls back to the per-env
    pair/merge route and still matches."""
    wrapper, _ = build_wrapper()   # default raster: xla backend
    states = _batch_reset(wrapper, B=2)
    actions = jnp.asarray([[0.1, -0.1], [0.4, 0.2]])
    caches = wrapper.build_render_cache()
    trb = wrapper.step_with_cache_batch(states, actions, caches)
    for b in range(2):
        s_b = jax.tree.map(lambda x: x[b], states)
        tr = wrapper.step_with_cache(s_b, actions[b], caches)
        for k in ("camera_0", "camera_1"):
            np.testing.assert_allclose(np.asarray(trb.obs[k][b]),
                                       np.asarray(tr.obs[k]),
                                       atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_render_with_cache_differentiable():
    """Pixel grads must flow through the cached path into the scene (cache
    build AND per-frame dynamic route)."""
    wrapper, _ = build_wrapper()
    state, _ = wrapper.reset(jax.random.key(0), {
        "robot_pos": np.zeros(2),
        "block_pos": np.array([0.45, 0.1, 0.2, 0.3]),
    })
    import dataclasses

    def loss(scene):
        w = dataclasses.replace(wrapper,
                                graph=wrapper.graph._replace(scene=scene))
        caches = w.build_render_cache(scene)
        imgs = w.render_with_cache(state, caches)
        return sum(jnp.mean(i ** 2) for i in imgs)

    g = jax.grad(loss)(wrapper.graph.scene)
    gm = np.asarray(g.means)
    assert np.isfinite(gm).all()
    assert np.abs(gm).max() > 0


def test_rollout_with_cache_batch_matches_stepwise():
    """The R-step rollout (frame-coherent moving-camera candidate caches,
    ops/rasterize_moving.py) must reproduce sequential
    ``step_with_cache_batch`` calls whose moving camera full-rebins —
    same rewards, same images (both cameras), zero severe drops."""
    import dataclasses

    wrapper, _ = build_wrapper()
    # lift the moving camera out of the background cloud: with gaussians
    # centimeters from the lens, ANY camera motion honestly exceeds a
    # margin budget (their footprints really do fly across the screen)
    cams = dict(wrapper.cameras)
    cams[1] = dataclasses.replace(
        cams[1], local_frame=((1.0, 0, 0, 0), (0.0, 0.0, -2.2)))
    wrapper = dataclasses.replace(
        wrapper, cameras=tuple(cams.items()),
        raster=RasterConfig(tile_capacity=128, chunk=128,
                            sigma_cutoff=3.0,
                            backend="pallas_interpret"))
    states = _batch_reset(wrapper, B=2)
    R = 2
    actions_seq = jnp.asarray(
        [[[0.01, -0.01], [0.015, 0.005]],
         [[0.015, -0.005], [0.01, 0.01]]], jnp.float32)    # (R, B, 2)
    caches = wrapper.build_render_cache()

    trs = jax.jit(lambda s, a: wrapper.rollout_with_cache_batch(
        s, a, caches, sel_tiles=12, moving_margin=80.0,
        moving_kc=128))(states, actions_seq)
    assert int(trs.info["render_overflow"].max()) == 0

    s = states
    for t in range(R):
        tr = wrapper.step_with_cache_batch(s, actions_seq[t], caches,
                                           sel_tiles=12)
        s = tr.state
        np.testing.assert_allclose(np.asarray(trs.reward[t]),
                                   np.asarray(tr.reward), rtol=1e-5,
                                   atol=1e-6)
        for k in ("camera_0", "camera_1"):
            np.testing.assert_allclose(np.asarray(trs.obs[k][t]),
                                       np.asarray(tr.obs[k]),
                                       atol=1e-4, rtol=1e-3)
