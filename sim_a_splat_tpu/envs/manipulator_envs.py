"""Manipulator environment: joint-space arm + planar T-block task.

Functional twin of the reference's Drake-based ``ManipulatorSimEnv``
(manipulator_env.py:45-416) and ``ManipulatorEEFWrapper``
(manipulator_eef_wrapper.py:12-103).  What Drake provides natively is
replaced TPU-first (SURVEY.md §2.3 N3-N5):

- plant + InverseDynamicsController + interpolator → per-joint PD closed
  loop (physics/kinematics.arm_step), time_step 1e-2 (manipulator_env.py:58)
- hydroelastic EEF↔block contact (manipulator_sim_utils.py:94-112: EEF
  proxy cylinder r=0.013) → planar circle-vs-T impulse contact in the
  table plane with the same solver as pushT (the block's motion in the
  reference is effectively planar: it slides on the table)
- T-block from assets/tblock_paper/tblock_paper.{obj,sdf}: crossbar
  0.2×0.05 m + stem 0.05×0.15 m, mass 0.2, μ=1, CoG (0, −3/70)
- reward = −‖goal − block‖ − |Δyaw|, done |reward| < 0.02
  (manipulator_env.py:334-355); reset distribution of :166-176 including
  the RollPitchYaw(0,0,−yaw) sign convention
- ``draw_state`` replaces ``_generate_draw_msg`` (:377-390): batched body
  poses + static schema instead of LCM messages.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sim_a_splat_tpu.messaging.draw import (
    DrawState, LinkSchema, ROBOT_NUM_ROBOT, ROBOT_NUM_TASK, SceneSchema,
)
from sim_a_splat_tpu.ops import quaternion as quat
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.physics import kinematics as kin
from sim_a_splat_tpu.physics import planar


# --- task object ------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TBlockParams:
    """tblock_paper geometry/inertia (assets/tblock_paper/tblock_paper.sdf:
    1-51, obj vertices; meters/kg)."""

    crossbar_half_x: float = 0.1
    crossbar_half_y: float = 0.025
    stem_half_x: float = 0.025
    stem_y0: float = -0.175
    stem_y1: float = -0.025
    mass: float = 0.2
    izz: float = 0.003755952380952381     # about CoG (sdf inertial)
    cog_y: float = -0.042857142857142844  # sdf inertial pose
    mu: float = 1.0

    def polys_local(self) -> np.ndarray:
        """(2, 4, 2) CCW box vertices in the block frame."""
        cb = [(-self.crossbar_half_x, -self.crossbar_half_y),
              (self.crossbar_half_x, -self.crossbar_half_y),
              (self.crossbar_half_x, self.crossbar_half_y),
              (-self.crossbar_half_x, self.crossbar_half_y)]
        st = [(-self.stem_half_x, self.stem_y0),
              (self.stem_half_x, self.stem_y0),
              (self.stem_half_x, self.stem_y1),
              (-self.stem_half_x, self.stem_y1)]
        return np.asarray([cb, st], np.float32)


class ManipulatorState(NamedTuple):
    arm: kin.ArmState
    block_pos: jnp.ndarray    # (2,) world xy (z = 0 on the table)
    block_yaw: jnp.ndarray    # () world yaw (Drake convention)
    block_vel: jnp.ndarray    # (2,)
    block_omega: jnp.ndarray  # ()
    goal: jnp.ndarray         # (4,) [x, y, z, yaw_world]
    prev_eef_xy: jnp.ndarray  # (2,) for EEF velocity at the contact
    t: jnp.ndarray            # () sim time


class Transition(NamedTuple):
    state: ManipulatorState
    obs: Any
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    info: dict


@dataclasses.dataclass(frozen=True, eq=False)
class ManipulatorEnvF:
    """Functional manipulator env.

    Args mirror the reference ctor (manipulator_env.py:46-56): URDF path in
    place of package plumbing, ``env_objects`` gates the T-block task,
    ``weld`` is the base weld transform (non-identity in the hardware
    mirror demo, demo_hw_splat.py:58).
    """

    chain: kin.KinematicChain
    eef_link: str
    env_objects: bool = True
    weld: tuple = ((1.0, 0.0, 0.0, 0.0), (0.0, 0.0, 0.0))  # (q wxyz, t)
    time_step: float = 1e-2
    kp: float = 100.0
    kd: float = 20.0
    eef_radius: float = 0.013      # EEF contact cylinder (sim_utils :104-112)
    block: TBlockParams = TBlockParams()
    contact_substeps: int = 4
    # Positional-correction constants, pinned to Chipmunk's defaults (the
    # same schedule the pushT path uses and is oracle-validated against,
    # physics/pusht.py:69-86): bias None ⇒ 1 − ((1−0.1)**60)**dt per
    # substep; slop = 1e-4 m is Chipmunk's 0.1-unit default scaled from
    # pushT's 512-px workspace to this task's ~0.5-m workspace.
    contact_bias: float | None = None
    contact_slop: float = 1e-4
    default_goal: tuple = (0.475, 0.0, 0.2, 0.78539816)

    def _base(self) -> SE3:
        return SE3(jnp.asarray(self.weld[0], jnp.float32),
                   jnp.asarray(self.weld[1], jnp.float32))

    @property
    def num_dof(self) -> int:
        return self.chain.ndof

    # --- schema (the load-msg analogue) ---

    def schema(self) -> SceneSchema:
        from sim_a_splat_tpu.messaging import GeomSchema
        from sim_a_splat_tpu.scenegraph.mesh_overlay import geom_of_visual

        links = []
        for i, n in enumerate(self.chain.link_names):
            vis = self.chain.visuals[i]
            geoms = ((geom_of_visual(n, vis),) if vis is not None else ())
            links.append(LinkSchema(name=f"plant::{n}",
                                    robot_num=ROBOT_NUM_ROBOT, geoms=geoms))
        if self.env_objects:
            # the reference task mesh handle's fixed color
            # (splat_handler.py:204: [0.956, 0.396, 0.365])
            links.append(LinkSchema(
                name="plant::tblock_paper", robot_num=ROBOT_NUM_TASK,
                geoms=(GeomSchema(name="tblock_paper", type=4,
                                  color=(0.956, 0.396, 0.365, 1.0),
                                  string_data="assets/tblock_paper/"
                                              "tblock_paper.obj"),)))
        return SceneSchema(links=tuple(links))

    def draw_state(self, state: ManipulatorState) -> DrawState:
        """Body poses ordered as :meth:`schema` — the ``_generate_draw_msg``
        equivalent (manipulator_env.py:377-390)."""
        poses = kin.fk(self.chain, state.arm.q, self._base())
        if self.env_objects:
            bq = quat.from_axis_angle(jnp.asarray([0.0, 0, 1]), state.block_yaw)
            bt = jnp.concatenate([state.block_pos, jnp.zeros(1)])
            poses = SE3(jnp.concatenate([poses.q, bq[None]]),
                        jnp.concatenate([poses.t, bt[None]]))
        return DrawState(poses=poses)

    # --- reset -------------------------------------------------------------

    def reset(self, key: jax.Array,
              reset_to_state: Optional[dict] = None) -> tuple["ManipulatorState", Any]:
        if reset_to_state is None:
            k1, k2, k3 = jax.random.split(key, 3)
            robot_pos = jax.random.uniform(
                k1, (self.num_dof,), jnp.float32, -jnp.pi, jnp.pi)
            block_pos = jax.random.uniform(
                k2, (4,), jnp.float32,
                jnp.asarray([0.4, -0.183, 0.2, -np.pi], jnp.float32),
                jnp.asarray([0.55, 0.183, 0.2, np.pi], jnp.float32))
            goal_pos = jnp.asarray(self.default_goal, jnp.float32)
        else:
            robot_pos = jnp.asarray(reset_to_state["robot_pos"], jnp.float32)
            block_pos = jnp.asarray(
                reset_to_state.get("block_pos", (0.475, 0.0, 0.2, 0.0)),
                jnp.float32)
            goal_pos = jnp.asarray(
                reset_to_state.get("goal_pos", self.default_goal), jnp.float32)

        # reference zeroes z and negates yaw via RollPitchYaw(0,0,-yaw)
        # (manipulator_env.py:177-200)
        state = ManipulatorState(
            arm=kin.arm_init(self.chain, robot_pos),
            block_pos=block_pos[:2],
            block_yaw=-block_pos[3],
            block_vel=jnp.zeros(2, jnp.float32),
            block_omega=jnp.zeros((), jnp.float32),
            goal=goal_pos.at[2].set(0.0).at[3].set(-goal_pos[3]),
            prev_eef_xy=jnp.zeros(2, jnp.float32),
            t=jnp.zeros((), jnp.float32),
        )
        eef = self._eef_pose(state)
        state = state._replace(prev_eef_xy=eef.t[:2])
        return state, self._get_obs(state)

    # --- step --------------------------------------------------------------

    def _eef_pose(self, state: ManipulatorState) -> SE3:
        return kin.link_pose(self.chain, state.arm.q, self.eef_link,
                             self._base())

    def _block_substep(self, state: ManipulatorState, eef_xy, eef_vel_xy,
                       dt: float) -> ManipulatorState:
        bp = self.block
        polys_local = jnp.asarray(bp.polys_local())
        R = planar.rot2d(state.block_yaw)
        polys = state.block_pos[None, None, :] + jnp.einsum(
            "ij,pvj->pvi", R, polys_local)
        cs = [planar.circle_poly_contact(eef_xy, self.eef_radius, polys[i],
                                         eef_vel_xy, bp.mu)
              for i in range(2)]
        contacts = jax.tree.map(lambda *x: jnp.stack(x), *cs)
        contacts = contacts._replace(normal=-contacts.normal)
        cog = state.block_pos + R @ jnp.asarray([0.0, bp.cog_y], jnp.float32)
        body = planar.PlanarBody(cog=cog, angle=state.block_yaw,
                                 vel=jnp.zeros(2, jnp.float32),
                                 omega=jnp.zeros((), jnp.float32))
        bias = (self.contact_bias if self.contact_bias is not None
                else 1.0 - ((1.0 - 0.1) ** 60.0) ** dt)
        v, w, vb, wb, _ = planar.solve_contacts(
            body, contacts, 1.0 / bp.mass, 1.0 / bp.izz, dt,
            iterations=10, bias=bias, slop=self.contact_slop)
        new_cog = cog + (v + vb) * dt
        new_yaw = state.block_yaw + (w + wb) * dt
        new_pos = new_cog - planar.rot2d(new_yaw) @ jnp.asarray(
            [0.0, bp.cog_y], jnp.float32)
        return state._replace(block_pos=new_pos, block_yaw=new_yaw,
                              block_vel=v, block_omega=w)

    def step(self, state: ManipulatorState, action: jnp.ndarray) -> Transition:
        prev_eef = self._eef_pose(state).t[:2]
        arm = kin.arm_step(self.chain, state.arm, jnp.asarray(action),
                           dt=self.time_step, kp=self.kp, kd=self.kd)
        state = state._replace(arm=arm, t=state.t + self.time_step)
        eef = self._eef_pose(state)
        if self.env_objects:
            new_eef = eef.t[:2]
            eef_vel = (new_eef - prev_eef) / self.time_step
            h = self.time_step / self.contact_substeps

            def sub(s, i):
                frac = (i + 1.0) / self.contact_substeps
                exy = prev_eef + frac * (new_eef - prev_eef)
                return self._block_substep(s, exy, eef_vel, h), None

            state, _ = lax.scan(sub, state,
                                jnp.arange(self.contact_substeps,
                                           dtype=jnp.float32))
        state = state._replace(prev_eef_xy=eef.t[:2])
        obs = self._get_obs(state)
        info = self._get_info(state)
        reward = self._compute_reward(state)
        terminated = jnp.abs(reward) < 0.02
        return Transition(state=state, obs=obs, reward=reward,
                          terminated=terminated,
                          truncated=jnp.zeros((), bool), info=info)

    # --- obs / info / reward (manipulator_env.py:283-355) -------------------

    def _get_obs(self, state: ManipulatorState):
        return {"robot_joint_pos": state.arm.q,
                "robot_joint_vel": state.arm.qd}

    def _get_info(self, state: ManipulatorState) -> dict:
        eef = self._eef_pose(state)
        # EEF spatial velocity via the kinematic Jacobian (Drake
        # EvalBodySpatialVelocityInWorld equivalent)
        def pos_of(qj):
            return kin.link_pose(self.chain, qj, self.eef_link, self._base()).t
        J = jax.jacfwd(pos_of)(state.arm.q)
        eef_pos_vel = J @ state.arm.qd
        def rotvec_of(qj):
            p = kin.link_pose(self.chain, qj, self.eef_link, self._base())
            return kin.orientation_error(p.q, jax.lax.stop_gradient(eef.q))
        Jr = jax.jacfwd(rotvec_of)(state.arm.q)
        eef_rot_vel = Jr @ state.arm.qd
        info = {
            "eef_pos": eef.t,
            "eef_quat": quat.normalize(eef.q),
            "eef_pos_vel": eef_pos_vel,
            "eef_rot_vel": eef_rot_vel,
            "timestamp": state.t,
        }
        if self.env_objects:
            bq = quat.from_axis_angle(jnp.asarray([0.0, 0, 1]),
                                      state.block_yaw)
            info["block_pose"] = jnp.concatenate(
                [bq, state.block_pos, jnp.zeros(1)])
            info["block_vel"] = jnp.concatenate(
                [jnp.zeros(2), state.block_omega[None],
                 state.block_vel, jnp.zeros(1)])
        return info

    def _compute_reward(self, state: ManipulatorState) -> jnp.ndarray:
        if not self.env_objects:
            return jnp.zeros(())
        block3 = jnp.concatenate([state.block_pos, jnp.zeros(1)])
        goal3 = state.goal[:3]
        r1 = -jnp.linalg.norm(goal3 - block3)
        r2 = -jnp.abs(state.goal[3] - state.block_yaw)
        return r1 + r2
