"""Gaussian splat scene pytrees and loaders."""

from sim_a_splat_tpu.splat.scene import GaussianScene
from sim_a_splat_tpu.splat import loaders
from sim_a_splat_tpu.splat.loaders import (
    load, load_json, load_ply, load_npz, save_npz, load_nerfstudio,
    synthetic_scene, aabb_mask,
)

__all__ = [
    "GaussianScene", "loaders", "load", "load_json", "load_ply", "load_npz",
    "save_npz", "load_nerfstudio", "synthetic_scene", "aabb_mask",
]
