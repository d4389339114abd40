"""Pure-JAX physics: planar rigid bodies (pushT) and articulated chains."""

from sim_a_splat_tpu.physics import planar, pusht
from sim_a_splat_tpu.physics.pusht import (
    PushTParams, PushTState, control_step, coverage, get_obs, reset,
    reward_done, sample_reset_state, set_state,
)

__all__ = [
    "planar", "pusht",
    "PushTParams", "PushTState", "control_step", "coverage", "get_obs",
    "reset", "reward_done", "sample_reset_state", "set_state",
]
