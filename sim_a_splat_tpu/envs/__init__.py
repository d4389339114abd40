"""Environments: functional cores + Gymnasium adapters."""

from sim_a_splat_tpu.envs import keypoints, render2d
from sim_a_splat_tpu.envs.pusht_envs import PushTEnvF, Transition
from sim_a_splat_tpu.envs.manipulator_envs import ManipulatorEnvF, ManipulatorState, TBlockParams
from sim_a_splat_tpu.envs.eef_wrapper import ManipulatorEEFWrapperF
from sim_a_splat_tpu.envs.gym_adapter import (
    PushTEnv, PushTImageEnv, PushTKeypointsEnv, register_envs,
)
from sim_a_splat_tpu.envs.manipulator_gym import (
    ManipulatorEEFWrapper, ManipulatorSimEnv,
)
from sim_a_splat_tpu.envs.splat_wrapper import CameraSpec, SplatEnvWrapperF
from sim_a_splat_tpu.envs.splat_gym import SplatEnvWrapper

__all__ = [
    "keypoints", "render2d", "PushTEnvF", "Transition",
    "ManipulatorEnvF", "ManipulatorState", "TBlockParams",
    "ManipulatorEEFWrapperF", "ManipulatorEEFWrapper", "ManipulatorSimEnv",
    "PushTEnv", "PushTImageEnv", "PushTKeypointsEnv", "register_envs",
    "CameraSpec", "SplatEnvWrapperF",
]
