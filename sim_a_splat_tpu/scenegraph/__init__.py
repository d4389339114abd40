"""Articulated splat scene graph (per-link subsets + SE(3) posing)."""

from sim_a_splat_tpu.scenegraph.graph import SceneGraph, body_poses_from_parts
from sim_a_splat_tpu.scenegraph.mesh_overlay import (
    geom_of_visual, overlay_frame_poses, urdf_overlay_graph, visual_mesh,
)
from sim_a_splat_tpu.scenegraph.registration import (
    attached_frame,
    attached_frame_world,
    canonicalize,
    conjugated_link_transform,
    load_icp_sim3,
    load_link_masks,
    splat_to_world_pose,
    world_to_splat_pose,
)

__all__ = [
    "SceneGraph", "body_poses_from_parts",
    "geom_of_visual", "overlay_frame_poses", "urdf_overlay_graph",
    "visual_mesh",
    "attached_frame", "attached_frame_world", "canonicalize",
    "conjugated_link_transform", "load_icp_sim3", "load_link_masks",
    "splat_to_world_pose", "world_to_splat_pose",
]
