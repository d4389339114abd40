"""Core math and rendering ops (quaternions, SE3/Sim3, SH, covariances,
projection, and the differentiable rasterizers)."""

from sim_a_splat_tpu.ops import quaternion
from sim_a_splat_tpu.ops import transforms
from sim_a_splat_tpu.ops import sh
from sim_a_splat_tpu.ops import covariance
from sim_a_splat_tpu.ops.transforms import SE3, Sim3
from sim_a_splat_tpu.ops.covariance import compute_cov, compute_cov_inv
from sim_a_splat_tpu.ops.sh import sh_to_rgb, rgb_to_sh, eval_sh_color
from sim_a_splat_tpu.ops.projection import Camera, project
from sim_a_splat_tpu.ops.rasterize_reference import render_reference, render_reference_sh
from sim_a_splat_tpu.ops.rasterize_tiles import (
    RasterAux, RasterConfig, rasterize, rasterize_sh,
)

__all__ = [
    "quaternion", "transforms", "sh", "covariance",
    "SE3", "Sim3", "compute_cov", "compute_cov_inv",
    "sh_to_rgb", "rgb_to_sh", "eval_sh_color",
    "Camera", "project", "render_reference", "render_reference_sh",
    "RasterAux", "RasterConfig", "rasterize", "rasterize_sh",
]
