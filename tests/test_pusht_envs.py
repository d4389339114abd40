"""pushT env family: obs contracts, Gym adapter API, renderer, vmap."""

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.envs import (
    PushTEnv, PushTImageEnv, PushTKeypointsEnv, register_envs,
)
from sim_a_splat_tpu.envs.pusht_envs import PushTEnvF
from sim_a_splat_tpu.envs import keypoints as kp_mod, render2d
from sim_a_splat_tpu.physics.pusht import PushTParams
import pytest


def test_state_env_api_parity():
    env = PushTEnv(seed=0)
    obs = env.reset()
    assert obs.shape == (5,)
    assert env.observation_space.contains(obs)
    act = np.asarray([150.0, 250.0])
    obs, reward, done, info = env.step(act)
    assert env.observation_space.contains(obs)
    assert 0.0 <= reward <= 1.0
    assert isinstance(done, bool)
    for k in ["pos_agent", "vel_agent", "block_pose", "goal_pose",
              "n_contacts"]:
        assert k in info
    img = env.render("rgb_array")
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8


def test_reset_to_state_deterministic():
    vec = [100.0, 120.0, 160.0, 300.0, 0.7]
    e1 = PushTEnv(reset_to_state=vec, seed=1)
    e2 = PushTEnv(reset_to_state=vec, seed=99)
    o1, o2 = e1.reset(), e2.reset()
    np.testing.assert_allclose(o1, o2, atol=1e-6)
    np.testing.assert_allclose(o1[:4], vec[:4], atol=0.5)  # settle step may nudge


def test_keypoints_env_obs_layout():
    env = PushTKeypointsEnv(seed=2)
    obs = env.reset()
    # 9 block kps ×2 + agent_pos(2) = 20, doubled with mask = 40
    assert obs.shape == (40,)
    assert np.all(obs[20:] == 1.0)  # fully visible at rate 1.0
    env_drop = PushTKeypointsEnv(keypoint_visible_rate=0.5, seed=3)
    masks = [env_drop.reset()[20:] for _ in range(8)]
    assert any(m.min() == 0.0 for m in masks)   # some dropout happened
    # agent slot always visible (reference :105-108)
    assert all(m[18:20].min() == 1.0 for m in masks)


def test_keypoints_track_block():
    env_f = PushTEnvF(obs_mode="keypoints")
    kmap = env_f._kp_map()
    state, obs = env_f.reset(jax.random.key(0),
                             jnp.asarray([60., 60., 200., 300., 0.5]))
    kps = np.asarray(obs[:18]).reshape(9, 2)
    expect = np.asarray(kp_mod.keypoints_global(
        jnp.asarray(kmap["block"]), state.block_pos, state.block_angle))
    np.testing.assert_allclose(kps, expect, atol=1e-5)


def test_image_env_contract():
    env = PushTImageEnv(seed=4)
    obs = env.reset()
    assert obs["image"].shape == (3, 96, 96)
    assert 0.0 <= obs["image"].min() and obs["image"].max() <= 1.0
    assert obs["agent_pos"].shape == (2,)
    obs2, *_ = env.step(np.asarray([150.0, 250.0]))
    # action marker (red cross) present after a step
    img = np.moveaxis(obs2["image"], 0, -1)
    red = (img[..., 0] > 0.9) & (img[..., 1] < 0.2) & (img[..., 2] < 0.2)
    assert red.sum() >= 4


def test_render_frame_contents():
    p = PushTParams()
    from sim_a_splat_tpu.physics import pusht as pp
    st = pp.set_state(p, jnp.asarray([80., 90., 149., 256., 0.0]))
    img = np.asarray(render2d.render_frame(p, st, 96))
    # agent RoyalBlue near its position (scaled into squashed 96×96)
    ax, ay = 80 / p.ws_x * 96, 90 / p.ws_y * 96
    np.testing.assert_allclose(img[int(ay), int(ax)],
                               np.asarray(render2d.COL_AGENT) / 255, atol=0.02)
    # block LightSlateGray at its center
    bx, by = 149 / p.ws_x * 96, (256 + 15) / p.ws_y * 96
    np.testing.assert_allclose(img[int(by), int(bx)],
                               np.asarray(render2d.COL_BLOCK) / 255, atol=0.02)
    # background white somewhere in a corner region inside walls
    np.testing.assert_allclose(img[8, 48], [1, 1, 1], atol=1e-5)


def test_gym_registration():
    import gymnasium as gym
    register_envs()
    env = gym.make("pusht-keypoints-v0")
    assert env.spec.max_episode_steps == 200
    env.unwrapped.seed(0)
    obs = env.unwrapped.reset()
    assert obs.shape == (40,)


@pytest.mark.slow
def test_functional_vmap_batch():
    env_f = PushTEnvF(obs_mode="state")
    keys = jax.random.split(jax.random.key(1), 8)
    states, obs = jax.vmap(env_f.reset)(keys)
    assert obs.shape == (8, 5)
    acts = jnp.tile(jnp.asarray([150., 250.]), (8, 1))
    tr = jax.jit(jax.vmap(lambda s, a: env_f.step(s, a)))(states, acts)
    assert tr.obs.shape == (8, 5)
    assert tr.reward.shape == (8,)


@pytest.mark.slow
def test_set_state_local_goal_relative():
    """_set_state_local composes the local block pose with the goal pose
    (reference pusht_env.py:312-329): zero local pose ⇒ block exactly at
    goal ⇒ coverage reward 1."""
    env = PushTEnv(seed=0)
    env.reset()
    new_state = env._set_state_local([0.0, 0.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(new_state[2:], env.goal_pose, atol=1e-6)
    _, reward, done, _ = env.step(new_state[:2])
    assert reward > 0.9

    # non-zero local pose: block offset rotates with the goal frame
    s = env._set_state_local([10.0, 0.0, 5.0, 0.0, 0.1])
    g = env.goal_pose
    c, si = np.cos(g[2]), np.sin(g[2])
    np.testing.assert_allclose(s[2:4], g[:2] + np.array([5 * c, 5 * si]),
                               atol=1e-6)
    np.testing.assert_allclose(s[4], g[2] + 0.1, atol=1e-6)
