"""Task-space (EEF) action wrapper over the manipulator env.

Functional twin of ``ManipulatorEEFWrapper`` (manipulator_eef_wrapper.py:
12-103): action = {eef_pos (3,), eef_ori (3, rpy)} → differential IK →
joint-target step; observation remapped to EEF pose/velocities (:91-103).
The Drake IK's ±1e-4 position / θ-bound orientation tolerances become the
convergence thresholds of the jittable DLS solver (physics/kinematics.ik);
IK failure surfaces as ``info["ik_converged"]`` plus (in the Gym adapter) a
RuntimeError matching the reference's raise (:79-80).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from sim_a_splat_tpu.envs.manipulator_envs import ManipulatorEnvF, ManipulatorState
from sim_a_splat_tpu.ops import quaternion as quat
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.physics import kinematics as kin


class EEFTransition(NamedTuple):
    state: ManipulatorState
    obs: dict
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    info: dict


@dataclasses.dataclass(frozen=True, eq=False)
class ManipulatorEEFWrapperF:
    env: ManipulatorEnvF
    theta_bound: float = 1e-4    # reference default (wrapper ctor :13)
    ik_iterations: int = 60

    def eefpose2config(self, state: ManipulatorState,
                      eefpose: jnp.ndarray) -> kin.IKResult:
        """[x, y, z, roll, pitch, yaw] → joint config (reference :54-82);
        initial guess = current q (:75-77)."""
        target = SE3(quat.from_rpy(eefpose[3:]), eefpose[:3])
        return kin.ik(
            self.env.chain, self.env.eef_link, target, q0=state.arm.q,
            base=self.env._base(), iterations=self.ik_iterations,
            pos_tol=1e-4, theta_bound=max(self.theta_bound, 1e-3),
        )

    def reset(self, key: jax.Array, reset_to_state=None):
        state, _ = self.env.reset(key, reset_to_state)
        return state, self._obs(state)

    def step(self, state: ManipulatorState, action: dict) -> EEFTransition:
        eefpose = jnp.concatenate([
            jnp.asarray(action["eef_pos"], jnp.float32),
            jnp.asarray(action["eef_ori"], jnp.float32),
        ])
        res = self.eefpose2config(state, eefpose)
        tr = self.env.step(state, res.q)
        obs = self._obs_from_info(tr.info)
        info = {
            "robot_joint_pos": tr.obs["robot_joint_pos"],
            "robot_joint_vel": tr.obs["robot_joint_vel"],
            "timestamp": tr.info["timestamp"],
            "ik_converged": res.converged,
            "ik_pos_err": res.pos_err,
        }
        if "block_pose" in tr.info:
            info["block_pose"] = tr.info["block_pose"]
        return EEFTransition(state=tr.state, obs=obs, reward=tr.reward,
                             terminated=tr.terminated, truncated=tr.truncated,
                             info=info)

    def _obs(self, state: ManipulatorState) -> dict:
        return self._obs_from_info(self.env._get_info(state))

    @staticmethod
    def _obs_from_info(info: dict) -> dict:
        return {
            "eef_pos": info["eef_pos"],
            "eef_quat": info["eef_quat"],
            "eef_pos_vel": info["eef_pos_vel"],
            "eef_rot_vel": info["eef_rot_vel"],
        }
