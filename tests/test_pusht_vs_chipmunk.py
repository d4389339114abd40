"""pushT dynamics vs Chipmunk ground truth (SURVEY.md §7: "verify task
dynamics against pymunk trajectories within tolerance").

The golden trajectories in ``tests/assets/pusht_goldens.npz`` are produced
by an independent numpy re-implementation of Chipmunk2D's step algorithm
(tests/chipmunk_oracle.py — see its docstring for why pymunk itself cannot
run in this environment).  The JAX solver and the oracle share no code: the
oracle is mutable/object-style with per-arbiter warm starting and Chipmunk's
position-first step order; the JAX path is fixed-slot, cold-start PGS.
Agreement within tolerance is therefore real cross-validation of the
reference dynamics (sim_a_splat/env/pusht/pusht_env.py:132-163, :331-440).

Tolerances: face-contact and wall-pinned pushing agree to sub-pixel; pushes
with sliding vertex/face feature transitions (push_stem) are locally chaotic
— normals flip at slightly different substeps — and drift a few px over 3 s
of contact while the orientation stays within ~0.015 rad.
"""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sim_a_splat_tpu.physics import pusht
from sim_a_splat_tpu.physics.pusht import PushTParams

GOLDENS = pathlib.Path(__file__).parent / "assets" / "pusht_goldens.npz"

# per-trajectory (block-pos atol px, angle atol rad)
TOLS = {
    "push_stem": (8.0, 0.03),         # sliding feature transitions
    "rotate_crossbar": (1.5, 0.02),
    "wall_pin": (1.5, 0.02),
    "legacy_push": (8.0, 0.05),
    "cog_override": (1.5, 0.03),   # ~2 full revolutions of accumulated spin
}


def _load(name):
    data = np.load(GOLDENS)
    cog = data[f"{name}/block_cog"]
    return {
        "start": data[f"{name}/start"],
        "actions": data[f"{name}/actions"],
        "obs": data[f"{name}/obs"],
        "legacy": bool(data[f"{name}/legacy"]),
        "block_cog": None if np.isnan(cog).any() else tuple(cog),
    }


@pytest.mark.parametrize("name", sorted(TOLS))
def test_trajectory_matches_chipmunk(name):
    spec = _load(name)
    import dataclasses
    params = PushTParams() if spec["block_cog"] is None else dataclasses.replace(
        PushTParams(), block_cog=spec["block_cog"])

    state = pusht.set_state(params, jnp.asarray(spec["start"], jnp.float32),
                            legacy=spec["legacy"])
    step = jax.jit(lambda s, a: pusht.control_step(params, s, a))
    traj = [np.asarray(pusht.get_obs(state))]
    for act in spec["actions"]:
        state = step(state, jnp.asarray(act, jnp.float32))
        traj.append(np.asarray(pusht.get_obs(state)))
    traj = np.asarray(traj)
    golden = spec["obs"]

    pos_atol, ang_atol = TOLS[name]
    pos_err = np.abs(traj[:, 2:4] - golden[:, 2:4]).max()
    # golden stores the raw (unwrapped) pymunk angle; obs wraps to [0, 2pi)
    ang_err = np.abs(np.unwrap(traj[:, 4]) % (2 * np.pi)
                     - golden[:, 4] % (2 * np.pi))
    ang_err = np.minimum(ang_err, 2 * np.pi - ang_err).max()
    agent_err = np.abs(traj[:, :2] - golden[:, :2]).max()

    assert agent_err < 1e-3, f"{name}: agent PD diverged by {agent_err}"
    assert pos_err < pos_atol, f"{name}: block pos err {pos_err:.3f} px"
    assert ang_err < ang_atol, f"{name}: block angle err {ang_err:.4f} rad"


def test_goldens_reproducible():
    """The committed .npz must match what the in-repo oracle generates —
    guards against silent drift of either artifact."""
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).parent / "assets"))
    import gen_pusht_goldens as gen

    data = np.load(GOLDENS)
    for name, spec in gen.TRAJECTORIES.items():
        from chipmunk_oracle import PushTOracle
        oracle = PushTOracle(block_cog=spec.get("block_cog"))
        start = np.asarray(spec["start"], float)
        oracle.set_state(start[:2], start[2:4], start[4],
                         legacy=spec.get("legacy", False))
        obs = [oracle.observation()]
        for act in spec["actions"]:
            oracle.control_step(np.asarray(act, float))
            obs.append(oracle.observation())
        np.testing.assert_allclose(np.asarray(obs), data[f"{name}/obs"],
                                   atol=1e-12, err_msg=name)
