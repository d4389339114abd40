"""Manipulator arm↔block contact vs Chipmunk ground truth (VERDICT r2 #7).

The pushT dynamics are pinned to an independent Chipmunk-semantics oracle
(tests/test_pusht_vs_chipmunk.py); this does the same for the manipulator
task's contact path — ``ManipulatorEnvF._block_substep`` (circle EEF vs
T-block in meters, quasi-static damping-0 solve) — against
``ManipulatorOracle``.  The env's positional-correction constants are the
Chipmunk defaults (bias schedule 1−0.9^(60·dt), slop 1e-4 m), so agreement
here justifies them instead of the ad-hoc r2 values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sim_a_splat_tpu.envs.manipulator_envs import (
    ManipulatorEnvF, ManipulatorState, TBlockParams,
)
from chipmunk_oracle import ManipulatorOracle

DT = 1e-2          # env control step
SUBSTEPS = 4
H = DT / SUBSTEPS


def make_env():
    # _block_substep touches only the contact fields — no chain needed
    return ManipulatorEnvF(chain=None, eef_link="", env_objects=True)


def dummy_state(block_pos, block_yaw):
    return ManipulatorState(
        arm=None,
        block_pos=jnp.asarray(block_pos, jnp.float32),
        block_yaw=jnp.asarray(block_yaw, jnp.float32),
        block_vel=jnp.zeros(2, jnp.float32),
        block_omega=jnp.zeros((), jnp.float32),
        goal=jnp.zeros(4, jnp.float32),
        prev_eef_xy=jnp.zeros(2, jnp.float32),
        t=jnp.zeros((), jnp.float32),
    )


def run_pair(block_pos, block_yaw, eef_start, eef_vel, seconds):
    """Drive env substep and oracle with the identical kinematic EEF path;
    returns (env_traj, oracle_traj) of (T, 3) [x, y, yaw]."""
    env = make_env()
    state = dummy_state(block_pos, block_yaw)
    sub = jax.jit(lambda s, exy, evel: env._block_substep(
        s, exy, evel, H))

    ora = ManipulatorOracle(dt=H, mu=env.block.mu, slop=env.contact_slop,
                            eef_radius=env.eef_radius)
    ora.set_state(block_pos, block_yaw)

    eef_start = np.asarray(eef_start, float)
    eef_vel = np.asarray(eef_vel, float)
    n_steps = int(round(seconds / DT))
    env_traj, ora_traj = [], []
    for t in range(n_steps):
        t0 = t * DT
        prev = eef_start + eef_vel * t0
        new = eef_start + eef_vel * (t0 + DT)
        for i in range(SUBSTEPS):
            frac = (i + 1.0) / SUBSTEPS
            exy = prev + frac * (new - prev)
            state = sub(state, jnp.asarray(exy, jnp.float32),
                        jnp.asarray(eef_vel, jnp.float32))
            ora.substep(exy, eef_vel)
        env_traj.append([float(state.block_pos[0]),
                         float(state.block_pos[1]),
                         float(state.block_yaw)])
        ora_traj.append([*ora.block.position, ora.block.a])
    return np.asarray(env_traj), np.asarray(ora_traj)


CASES = {
    # name: (block_pos, yaw, eef_start, eef_vel, seconds, pos_atol, yaw_atol)
    "face_push": ((0.5, 0.0), 0.0, (0.5, 0.12), (0.0, -0.05), 2.0,
                  2e-3, 0.02),
    "corner_rotate": ((0.5, 0.0), 0.0, (0.59, 0.12), (0.0, -0.05), 2.0,
                      4e-3, 0.05),
    "stem_side": ((0.5, 0.0), 0.0, (0.38, -0.1), (0.05, 0.0), 2.0,
                  4e-3, 0.05),
    "tilted_push": ((0.5, 0.0), 0.6, (0.56, 0.12), (0.0, -0.05), 2.0,
                    4e-3, 0.05),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_block_contact_matches_chipmunk(name):
    block_pos, yaw, eef_start, eef_vel, seconds, pos_atol, yaw_atol = \
        CASES[name]
    env_traj, ora_traj = run_pair(block_pos, yaw, eef_start, eef_vel,
                                  seconds)
    # the block must actually have moved (the scenario touches it)
    assert np.linalg.norm(ora_traj[-1, :2] - np.asarray(block_pos)) > 5e-3, \
        f"{name}: oracle block never moved — scenario broken"
    err_pos = np.abs(env_traj[:, :2] - ora_traj[:, :2]).max()
    err_yaw = np.abs(env_traj[:, 2] - ora_traj[:, 2]).max()
    assert err_pos < pos_atol, f"{name}: pos err {err_pos:.5f} m"
    assert err_yaw < yaw_atol, f"{name}: yaw err {err_yaw:.5f} rad"
