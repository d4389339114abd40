"""Offline tooling: mesh IO, registration/ICP, mask extraction, matching."""

from sim_a_splat_tpu.tools import masks, match, meshio, registration
from sim_a_splat_tpu.tools.match import match as run_match
from sim_a_splat_tpu.tools.mesh_to_splat import concat_scenes, mesh_to_splat
from sim_a_splat_tpu.tools.registration import icp, umeyama

__all__ = ["masks", "match", "meshio", "registration", "run_match",
           "concat_scenes", "mesh_to_splat", "icp", "umeyama"]
