"""Gymnasium adapters for the manipulator env family.

Constructor/API parity with the reference classes
(manipulator_env.py:45-416, manipulator_eef_wrapper.py:12-103): same
ctor keywords (package plumbing resolved to a URDF path the way
``sak.URDFutils`` does), same observation/action spaces, same
``step() → (obs, reward, terminated, truncated, info)`` 5-tuple.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import gymnasium as gym
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.envs.eef_wrapper import ManipulatorEEFWrapperF
from sim_a_splat_tpu.envs.manipulator_envs import ManipulatorEnvF
from sim_a_splat_tpu.physics import kinematics as kin


def resolve_urdf(package_path: str, package_name: str, urdf_name: str) -> Path:
    """The reference's path convention (sak.URDFutils): the URDF lives at
    ``<package_path>/<package_name>/urdf/<urdf_name>``."""
    base = Path(package_path) / package_name
    for cand in (base / "urdf" / urdf_name, base / urdf_name,
                 Path(package_path) / urdf_name):
        if cand.exists():
            return cand
    raise FileNotFoundError(
        f"URDF {urdf_name!r} not found under {package_path}/{package_name}")


class ManipulatorSimEnv(gym.Env):
    """Reference API twin of ``ManipulatorSimEnv`` (manipulator_env.py:45)."""

    def __init__(
        self,
        env_objects: bool = True,
        visualise_flag: bool = False,          # no meshcat; kept for parity
        eef_link_name: str = None,
        package_path: str = None,
        package_name: str = None,
        urdf_name: str = None,
        num_dof: int = None,
        weld_frame_transform=None,             # (q wxyz, t) tuple or 4×4
        urdf_path: str | Path | None = None,   # direct alternative
        seed: Optional[int] = None,
    ):
        if urdf_path is None:
            urdf_path = resolve_urdf(package_path, package_name, urdf_name)
        chain = kin.load_chain(urdf_path)
        if num_dof is not None and chain.ndof != num_dof:
            raise ValueError(
                f"URDF has {chain.ndof} dof, expected {num_dof}")
        weld = ((1.0, 0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
        if weld_frame_transform is not None:
            w = weld_frame_transform
            if (isinstance(w, (tuple, list)) and len(w) == 2
                    and len(w[0]) == 4):
                weld = (tuple(float(x) for x in w[0]),
                        tuple(float(x) for x in w[1]))
            else:
                from sim_a_splat_tpu.ops.transforms import SE3
                se3 = SE3.from_matrix(jnp.asarray(np.asarray(w, np.float64),
                                                  jnp.float32))
                weld = (tuple(np.asarray(se3.q)), tuple(np.asarray(se3.t)))
        self.env_f = ManipulatorEnvF(
            chain=chain, eef_link=eef_link_name, env_objects=env_objects,
            weld=weld)
        self.num_dof = chain.ndof
        self.time_step = self.env_f.time_step
        # package root for package:// mesh URI resolution (the reference's
        # URDF-content rewrite, splat_handler.py:146-152)
        self.package_path = package_path
        self.package_name = package_name

        self.observation_space = gym.spaces.Dict({
            "robot_joint_pos": gym.spaces.Box(-np.pi, np.pi,
                                              (self.num_dof,), np.float32),
            "robot_joint_vel": gym.spaces.Box(-np.inf, np.inf,
                                              (self.num_dof,), np.float32),
        })
        self.action_space = gym.spaces.Box(-np.pi, np.pi, (self.num_dof,),
                                           np.float32)
        self.seed(seed)
        self._state = None
        self._jit_reset = jax.jit(self.env_f.reset)
        self._jit_step = jax.jit(self.env_f.step)
        self._jit_draw = jax.jit(self.env_f.draw_state)

    def seed(self, seed=None):
        if seed is None:
            seed = np.random.randint(0, 25536)
        self._seed = seed
        self._key = jax.random.key(seed)

    def _split(self):
        self._key, k = jax.random.split(self._key)
        return k

    def reset(self, seed: Optional[int] = None, reset_to_state=None):
        if seed is not None:
            self.seed(seed)
        self._state, obs = self._jit_reset(self._split(), reset_to_state)
        return jax.tree.map(np.asarray, obs)

    def step(self, action, no_obs: bool = False):
        tr = self._jit_step(self._state, jnp.asarray(action, jnp.float32))
        self._state = tr.state
        obs = jax.tree.map(np.asarray, tr.obs)
        info = jax.tree.map(np.asarray, tr.info)
        return obs, float(tr.reward), bool(tr.terminated), bool(tr.truncated), info

    # the sim→splat bridge (manipulator_env.py:357-390)
    def _generate_loader_msg(self):
        return self.env_f.schema()

    def _generate_draw_msg(self):
        return self._jit_draw(self._state)

    def _get_obs(self):
        return jax.tree.map(np.asarray, self.env_f._get_obs(self._state))

    def _get_info(self):
        return jax.tree.map(np.asarray, self.env_f._get_info(self._state))

    def get_simulation_time(self):
        return float(self._state.t)

    def get_simulation_frequency(self):
        return self.time_step

    def render(self):
        pass

    def close(self):
        pass


class ManipulatorEEFWrapper(gym.Wrapper):
    """Reference API twin of ``ManipulatorEEFWrapper``
    (manipulator_eef_wrapper.py:12)."""

    def __init__(self, env: ManipulatorSimEnv, theta_bound: float = 1e-4):
        super().__init__(env)
        self.wrapper_f = ManipulatorEEFWrapperF(
            env=env.env_f, theta_bound=theta_bound)
        self.observation_space = gym.spaces.Dict({
            "eef_pos": gym.spaces.Box(-np.inf, np.inf, (3,), np.float32),
            "eef_quat": gym.spaces.Box(-np.inf, np.inf, (4,), np.float32),
            "eef_pos_vel": gym.spaces.Box(-np.inf, np.inf, (3,), np.float32),
            "eef_rot_vel": gym.spaces.Box(-np.inf, np.inf, (3,), np.float32),
        })
        self.action_space = gym.spaces.Dict({
            "eef_pos": gym.spaces.Box(-1.0, 1.0, (3,), float),
            "eef_ori": gym.spaces.Box(-np.pi, np.pi, (3,), float),
        })
        self.theta_bound = theta_bound
        self._jit_step = jax.jit(self.wrapper_f.step)

    def eefpose2config(self, eefpose):
        res = self.wrapper_f.eefpose2config(
            self.env._state, jnp.asarray(eefpose, jnp.float32))
        if not bool(res.converged):
            raise RuntimeError("Inverse kinematics failed")
        return np.asarray(res.q)

    def reset(self, **kwargs):
        self.env.reset(**kwargs)
        return jax.tree.map(
            np.asarray, self.wrapper_f._obs(self.env._state))

    def step(self, action):
        action = {k: jnp.asarray(v, jnp.float32) for k, v in action.items()}
        tr = self._jit_step(self.env._state, action)
        if not bool(tr.info["ik_converged"]):
            raise RuntimeError("Inverse kinematics failed")
        self.env._state = tr.state
        obs = jax.tree.map(np.asarray, tr.obs)
        info = jax.tree.map(np.asarray, tr.info)
        return obs, float(tr.reward), bool(tr.terminated), bool(tr.truncated), info
