"""Functional pushT environment family (state / keypoints / image obs).

The reference exposes three stateful Gym classes backed by one pymunk world
(pusht_env.py, pusht_keypoints_env.py, pusht_image_env.py).  Here the core
is a single *functional* environment over :class:`PushTState` — pure
``reset``/``step`` usable under jit/vmap/scan — with the observation mode as
static configuration.  Thin Gymnasium adapters (envs/gym_adapter.py) wrap it
for single-env API parity with the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.envs import keypoints as kp_mod
from sim_a_splat_tpu.envs import render2d
from sim_a_splat_tpu.physics import pusht
from sim_a_splat_tpu.physics.pusht import PushTParams, PushTState


class Transition(NamedTuple):
    state: PushTState
    obs: Any
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict


@dataclasses.dataclass(frozen=True, eq=False)
class PushTEnvF:
    """Functional pushT env.  ``obs_mode``: "state" | "keypoints" | "image".

    Reference parity notes:
    - "state" obs = [agent_xy, block_xy, angle mod 2π] (pusht_env.py:183-189)
    - "keypoints" obs = [block_kps(18) (+agent_kps(6)), agent_pos(2) if not
      agent_keypoints, mask(Do)] (pusht_keypoints_env.py:39-62, :79-110)
    - "image" obs = {"image": (3, H, W) float in [0,1], "agent_pos": (2,)}
      (pusht_image_env.py:19-50; that file is stale/broken in the reference
      — fixed semantics here)
    """

    params: PushTParams = PushTParams()
    obs_mode: str = "state"
    render_size: int = 96
    keypoint_visible_rate: float = 1.0
    agent_keypoints: bool = False
    legacy: bool = False
    render_action: bool = True
    local_keypoint_map: Optional[dict] = None
    damping: Optional[float] = None
    block_cog: Optional[tuple] = None
    max_episode_steps: int = 200      # registration default (pusht __init__.py)

    def _params(self) -> PushTParams:
        p = self.params
        if self.damping is not None:
            p = dataclasses.replace(p, damping=self.damping)
        if self.block_cog is not None:
            p = dataclasses.replace(p, block_cog=tuple(self.block_cog))
        return p

    def _kp_map(self) -> dict:
        if self.local_keypoint_map is not None:
            return self.local_keypoint_map
        return kp_mod.default_keypoint_map(self._params())

    # --- functional API ---

    def reset(self, key: jax.Array,
              reset_to_state: jnp.ndarray | None = None) -> tuple[PushTState, Any]:
        k1, k2 = jax.random.split(key)
        state = pusht.reset(self._params(), k1, reset_to_state,
                            legacy=self.legacy)
        return state, self.observe(state, key=k2)

    def step(self, state: PushTState, action: jnp.ndarray,
             key: jax.Array | None = None) -> Transition:
        p = self._params()
        state = pusht.control_step(p, state, action)
        reward, done = pusht.reward_done(p, state)
        obs = self.observe(state, key=key, action=action)
        return Transition(state=state, obs=obs, reward=reward, done=done,
                          info=self.info(state))

    def observe(self, state: PushTState, key: jax.Array | None = None,
                action: jnp.ndarray | None = None):
        p = self._params()
        if self.obs_mode == "state":
            return pusht.get_obs(state)
        if self.obs_mode == "keypoints":
            return self._keypoint_obs(state, key)
        if self.obs_mode == "image":
            img = render2d.render_frame(
                p, state, self.render_size,
                action=action if self.render_action else None)
            return {"image": jnp.moveaxis(img, -1, 0),
                    "agent_pos": state.agent_pos}
        raise ValueError(f"unknown obs_mode {self.obs_mode}")

    def _keypoint_obs(self, state: PushTState, key: jax.Array | None):
        kmap = self._kp_map()
        block = kp_mod.keypoints_global(
            jnp.asarray(kmap["block"]), state.block_pos, state.block_angle)
        parts = [block]
        if self.agent_keypoints:
            agent = kp_mod.keypoints_global(
                jnp.asarray(kmap["agent"]), state.agent_pos,
                jnp.zeros_like(state.block_angle))
            parts.append(agent)
        kps = jnp.concatenate(parts, axis=0)
        n = kps.shape[0]
        if key is None or self.keypoint_visible_rate >= 1.0:
            visible = jnp.ones((n,), bool)
        else:
            visible = jax.random.uniform(key, (n,)) < self.keypoint_visible_rate
        mask = jnp.repeat(visible[:, None], 2, axis=1)
        obs = kps.reshape(-1)
        obs_mask = mask.reshape(-1)
        if not self.agent_keypoints:
            obs = jnp.concatenate([obs, state.agent_pos])
            obs_mask = jnp.concatenate([obs_mask, jnp.ones(2, bool)])
        return jnp.concatenate([obs, obs_mask.astype(obs.dtype)])

    def info(self, state: PushTState) -> dict:
        p = self._params()
        return {
            "pos_agent": state.agent_pos,
            "vel_agent": state.agent_vel,
            "block_pose": jnp.concatenate(
                [state.block_pos, state.block_angle[None]]),
            "goal_pose": jnp.asarray(p.goal_pose, jnp.float32),
            "n_contacts": jnp.ceil(state.n_contacts / p.substeps),
        }

    def render(self, state: PushTState,
               action: jnp.ndarray | None = None) -> jnp.ndarray:
        return render2d.render_frame(
            self._params(), state, self.render_size,
            action=action if self.render_action else None)

    @property
    def obs_dim(self) -> int:
        if self.obs_mode == "state":
            return 5
        if self.obs_mode == "keypoints":
            kmap = self._kp_map()
            do = int(np.prod(kmap["block"].shape))
            do += int(np.prod(kmap["agent"].shape)) if self.agent_keypoints else 2
            return do * 2
        raise ValueError("image obs is a dict")
