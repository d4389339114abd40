"""Stateful Gymnasium adapters over the functional envs.

API parity with the reference classes (constructor signatures, observation/
action spaces, ``reset() -> obs`` / ``step() -> (obs, reward, done, info)``
return shapes follow pusht_env.py:95-163) while the actual computation is
the jitted functional core.  One adapter instance = one env; for batched
simulation use the functional API with ``vmap`` instead.
"""

from __future__ import annotations

import numpy as np
import gymnasium as gym
from gymnasium import spaces
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.envs.pusht_envs import PushTEnvF
from sim_a_splat_tpu.physics.pusht import PushTParams


class PushTEnv(gym.Env):
    """State-obs pushT (reference sim_a_splat/env/pusht/pusht_env.py)."""

    metadata = {"render.modes": ["human", "rgb_array"],
                "video.frames_per_second": 10}
    reward_range = (0.0, 1.0)

    def __init__(self, legacy=False, block_cog=None, damping=None,
                 render_action=True, render_size=96, reset_to_state=None,
                 obs_mode="state", keypoint_visible_rate=1.0,
                 agent_keypoints=False, local_keypoint_map=None, seed=None):
        self.env_f = PushTEnvF(
            params=PushTParams(),
            obs_mode=obs_mode,
            render_size=render_size,
            keypoint_visible_rate=keypoint_visible_rate,
            agent_keypoints=agent_keypoints,
            legacy=legacy,
            render_action=render_action,
            local_keypoint_map=local_keypoint_map,
            damping=damping,
            block_cog=None if block_cog is None else tuple(
                np.asarray(block_cog, np.float64).tolist()),
        )
        p = self.env_f._params()
        ws_x, ws_y = p.ws_x, p.ws_y
        if obs_mode == "state":
            self.observation_space = spaces.Box(
                low=np.array([0, 0, 0, 0, 0], dtype=np.float64),
                high=np.array([ws_x, ws_y, ws_x, ws_y, np.pi * 2],
                              dtype=np.float64),
                shape=(5,), dtype=np.float64)
        elif obs_mode == "keypoints":
            do = self.env_f.obs_dim // 2
            ws = max(ws_x, ws_y)
            low = np.zeros(do * 2, dtype=np.float64)
            high = np.full_like(low, ws)
            high[do:] = 1.0
            self.observation_space = spaces.Box(low=low, high=high,
                                                dtype=np.float64)
        elif obs_mode == "image":
            self.observation_space = spaces.Dict({
                "image": spaces.Box(0.0, 1.0, (3, render_size, render_size),
                                    np.float32),
                "agent_pos": spaces.Box(
                    np.zeros(2), np.array([ws_x, ws_y]), dtype=np.float32),
            })
        self.action_space = spaces.Box(
            low=np.zeros(2, dtype=np.float64),
            high=np.array([ws_x, ws_y], dtype=np.float64),
            shape=(2,), dtype=np.float64)

        self.reset_to_state = reset_to_state
        self.latest_action = None
        self._state = None
        self.seed(seed)
        self._jit_reset = jax.jit(self.env_f.reset)
        self._jit_step = jax.jit(self.env_f.step)
        self._jit_render = jax.jit(
            lambda s, a: self.env_f.render(s, a))

    # reference API (pusht_env.py:277-282)
    def seed(self, seed=None):
        if seed is None:
            seed = np.random.randint(0, 25536)
        self._seed = seed
        self._key = jax.random.key(seed)

    def _split(self):
        self._key, k = jax.random.split(self._key)
        return k

    def reset(self):
        rts = None if self.reset_to_state is None else jnp.asarray(
            self.reset_to_state, jnp.float32)
        self._state, obs = self._jit_reset(self._split(), rts)
        self.latest_action = None
        return jax.tree.map(np.asarray, obs)

    def step(self, action):
        action = jnp.asarray(action, jnp.float32)
        self.latest_action = action
        tr = self._jit_step(self._state, action, self._split())
        self._state = tr.state
        obs = jax.tree.map(np.asarray, tr.obs)
        info = {k: np.asarray(v) for k, v in tr.info.items()}
        return obs, float(tr.reward), bool(tr.done), info

    def render(self, mode="rgb_array"):
        img = self._jit_render(self._state, self.latest_action)
        return (np.asarray(img) * 255).astype(np.uint8)

    def _get_obs(self):
        return jax.tree.map(
            np.asarray, self.env_f.observe(self._state, key=self._split(),
                                           action=self.latest_action))

    def _get_info(self):
        return {k: np.asarray(v)
                for k, v in self.env_f.info(self._state).items()}

    @property
    def goal_pose(self):
        return np.asarray(self.env_f._params().goal_pose)

    def teleop_agent(self):
        """Mouse-teleop agent (reference pusht_env.py:168-181): act(obs)
        returns the mouse position while the button is held near the agent,
        else None.  Requires a pygame display (the demo opens one)."""
        import collections
        TeleopAgent = collections.namedtuple("TeleopAgent", ["act"])

        def act(obs):
            import pygame
            act = None
            mouse_position = pygame.mouse.get_pos()
            agent_pos = np.asarray(obs[:2], np.float64)
            lmb = pygame.mouse.get_pressed()[0]
            if lmb and (
                    self.teleop
                    or np.linalg.norm(np.asarray(mouse_position) - agent_pos)
                    < 30):
                self.teleop = True
                act = np.asarray(mouse_position, np.float64)
            return act

        self.teleop = False
        return TeleopAgent(act)

    def _set_state(self, state_vec):
        from sim_a_splat_tpu.physics import pusht as pusht_phys
        self._state = pusht_phys.set_state(
            self.env_f._params(), jnp.asarray(state_vec, jnp.float32),
            legacy=self.env_f.legacy)
        return self._get_obs()

    def _set_state_local(self, state_local):
        """Goal-relative state (reference pusht_env.py:312-329): the local
        block pose composes with the goal pose; the agent position is given
        in the local block frame."""
        state_local = np.asarray(state_local, np.float64)
        agent_local = state_local[:2]
        block_local = state_local[2:]

        def affine(tx, ty, r):
            c, s = np.cos(r), np.sin(r)
            return np.array([[c, -s, tx], [s, c, ty], [0.0, 0.0, 1.0]])

        g = self.goal_pose
        m = affine(g[0], g[1], g[2]) @ affine(block_local[0], block_local[1],
                                              block_local[2])
        agent_new = (m @ np.array([agent_local[0], agent_local[1], 1.0]))[:2]
        new_state = np.array([*agent_new, m[0, 2], m[1, 2],
                              np.arctan2(m[1, 0], m[0, 0])])
        self._set_state(new_state)
        return new_state

    def close(self):
        pass


class PushTKeypointsEnv(PushTEnv):
    """Keypoint-obs pushT (reference pusht_keypoints_env.py:8-121)."""

    def __init__(self, legacy=False, block_cog=None, damping=None,
                 render_size=96, keypoint_visible_rate=1.0,
                 agent_keypoints=False, draw_keypoints=False,
                 reset_to_state=None, render_action=True,
                 local_keypoint_map=None, color_map=None, seed=None):
        super().__init__(
            legacy=legacy, block_cog=block_cog, damping=damping,
            render_action=render_action, render_size=render_size,
            reset_to_state=reset_to_state, obs_mode="keypoints",
            keypoint_visible_rate=keypoint_visible_rate,
            agent_keypoints=agent_keypoints,
            local_keypoint_map=local_keypoint_map, seed=seed)
        self.draw_keypoints = draw_keypoints

    @classmethod
    def genenerate_keypoint_manager_params(cls):
        """Reference-spelling-preserving default keypoint config
        (pusht_keypoints_env.py:72-77)."""
        from sim_a_splat_tpu.envs.keypoints import default_keypoint_map
        return {"local_keypoint_map": default_keypoint_map(),
                "color_map": None}


class PushTImageEnv(PushTEnv):
    """Image-obs pushT (reference pusht_image_env.py:7-60, un-broken:
    the original imports legacy ``gym`` and references a removed
    attribute)."""

    def __init__(self, legacy=False, block_cog=None, damping=None,
                 render_size=96, seed=None):
        super().__init__(legacy=legacy, block_cog=block_cog, damping=damping,
                         render_size=render_size, obs_mode="image", seed=seed)


def register_envs():
    """Register ``pusht-keypoints-v0`` (fixes the reference's stale entry
    point string, sim_a_splat/env/pusht/__init__.py:1-9)."""
    from gymnasium.envs.registration import register, registry
    if "pusht-keypoints-v0" not in registry:
        register(
            id="pusht-keypoints-v0",
            entry_point=(
                "sim_a_splat_tpu.envs.gym_adapter:PushTKeypointsEnv"),
            max_episode_steps=200,
            reward_threshold=1.0,
        )
