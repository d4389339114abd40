"""Multi-device tests on the virtual 8-device CPU mesh (conftest.py):
sharded renderer vs single-device, env-sharded rollouts, train step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops.projection import Camera
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig, rasterize
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.parallel import (
    make_mesh, make_rollout, make_train_step, rasterize_sharded, shard_batch,
    shard_vmap,
)
from sim_a_splat_tpu.physics import PushTParams, pusht
from sim_a_splat_tpu.splat import synthetic_scene

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def make_camera(width=48, height=32):
    pose = SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, -3.0]))
    return Camera.from_fov(pose, 0.8, width, height)


def test_sharded_render_matches_single_device():
    mesh = make_mesh(env=1, prim=8)
    scene = synthetic_scene(333, seed=0, extent=0.8, scale_range=(0.03, 0.1))
    cam = make_camera()
    cfg = RasterConfig(tile_capacity=512, chunk=64, sigma_cutoff=3.0)
    covs = scene.covs()
    colors = scene.colors_dc()
    opac = scene.opacities()

    ref, aux = rasterize(scene.means, covs, colors, opac, cam, cfg)
    assert int(aux.n_overflowed_tiles) == 0
    img = jax.jit(lambda m, c, co, o: rasterize_sharded(
        mesh, m, c, co, o, cam, cfg, send_capacity=128))(
        scene.means, covs, colors, opac)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.slow
def test_sharded_render_differentiable():
    mesh = make_mesh(env=1, prim=8)
    scene = synthetic_scene(64, seed=1, extent=0.6, scale_range=(0.05, 0.1))
    cam = make_camera(width=16, height=16)
    cfg = RasterConfig(tile_capacity=128, chunk=32, sigma_cutoff=3.0)

    def loss(means):
        img = rasterize_sharded(mesh, means, scene.covs(), scene.colors_dc(),
                                scene.opacities(), cam, cfg,
                                send_capacity=32)
        return jnp.sum(img ** 2)

    def loss_ref(means):
        img, _ = rasterize(means, scene.covs(), scene.colors_dc(),
                           scene.opacities(), cam, cfg)
        return jnp.sum(img ** 2)

    g = jax.jit(jax.grad(loss))(scene.means)
    g_ref = jax.grad(loss_ref)(scene.means)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-4, rtol=5e-3)


@pytest.mark.slow
def test_env_sharded_rollout():
    mesh = make_mesh()     # 8-way env axis
    P_ = PushTParams()
    B, H = 32, 5
    keys = jax.random.split(jax.random.key(0), B)
    states = jax.vmap(lambda k: pusht.reset(P_, k))(keys)
    states = shard_batch(mesh, states)

    def step_fn(state, action):
        s = pusht.control_step(P_, state, action)
        r, d = pusht.reward_done(P_, s)
        return s, (pusht.get_obs(s), r, d)

    rollout = make_rollout(step_fn, mesh, horizon=H)
    actions = jnp.tile(jnp.asarray([150.0, 250.0]), (H, B, 1))
    final, (obs, r, d) = rollout(states, actions)
    assert obs.shape == (H, B, 5)
    assert np.isfinite(np.asarray(r)).all()
    # sharding survived the scan
    assert final.agent_pos.sharding.spec[0] == "env"

    # matches unsharded vmap rollout (jit once — an eager vmap loop here
    # re-dispatched every op per step and dominated the suite's wall time)
    states2 = jax.vmap(lambda k: pusht.reset(P_, k))(keys)
    step_j = jax.jit(jax.vmap(step_fn))
    s2 = states2
    for t in range(H):
        s2, (o2, r2, d2) = step_j(s2, actions[t])
    np.testing.assert_allclose(np.asarray(obs[-1]), np.asarray(o2), atol=1e-5)


@pytest.mark.slow
def test_shard_vmap_step():
    mesh = make_mesh()
    P_ = PushTParams()
    B = 16
    keys = jax.random.split(jax.random.key(1), B)
    states = shard_batch(mesh, jax.vmap(lambda k: pusht.reset(P_, k))(keys))
    f = shard_vmap(lambda s: pusht.get_obs(s), mesh)
    obs = f(states)
    assert obs.shape == (B, 5)


def test_train_step_replicated_params():
    import optax
    mesh = make_mesh()
    params = {"w": jnp.ones((5,)), "b": jnp.zeros(())}
    batch = jnp.asarray(np.random.default_rng(0).normal(size=(32, 5)),
                        jnp.float32)
    batch = shard_batch(mesh, batch)

    def loss_fn(p, x):
        pred = x @ p["w"] + p["b"]
        return jnp.mean(pred ** 2)

    opt = optax.sgd(0.1)
    step = make_train_step(loss_fn, opt, mesh)
    opt_state = opt.init(params)
    l0 = None
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, batch)
        l0 = l0 or float(loss)
    assert float(loss) < l0   # optimizing
    assert np.isfinite(np.asarray(params["w"])).all()
