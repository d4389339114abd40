"""Typed pose structs: the LCM viewer-message schema analogue."""

from sim_a_splat_tpu.messaging.draw import (
    DrawState, GEOM_BOX, GEOM_CYLINDER, GEOM_MESH, GEOM_SPHERE, GeomSchema,
    LinkSchema, ROBOT_NUM_ROBOT, ROBOT_NUM_TASK, SceneSchema,
)

__all__ = ["DrawState", "GeomSchema", "LinkSchema", "SceneSchema",
           "GEOM_BOX", "GEOM_SPHERE", "GEOM_CYLINDER", "GEOM_MESH",
           "ROBOT_NUM_ROBOT", "ROBOT_NUM_TASK"]
