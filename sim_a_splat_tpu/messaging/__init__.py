"""Typed pose structs: the LCM viewer-message schema analogue."""

from sim_a_splat_tpu.messaging.draw import (
    DrawState, LinkSchema, ROBOT_NUM_ROBOT, ROBOT_NUM_TASK, SceneSchema,
)

__all__ = ["DrawState", "LinkSchema", "SceneSchema",
           "ROBOT_NUM_ROBOT", "ROBOT_NUM_TASK"]
