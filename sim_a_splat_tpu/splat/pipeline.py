"""High-level splat pipeline — the ``GaussianSplat`` wrapper twin.

The reference wraps a nerfstudio splatfacto pipeline
(ns_utils/nerfstudio_utils.py:50-472) for: loading a trained run, rendering
poses, exporting (densified/culled) point clouds, RGB-D back-projection,
and CLIP semantic queries.  This module provides the same surface on the
TPU-native stack:

- :func:`load_run` reads the checkpoint + ``dataparser_transforms.json``
  (world scale/transform) without unpickling nerfstudio's TrainerConfig.
- :class:`GaussianSplatPipeline.render` renders any pose through the tile
  rasterizer (rgb/depth/accumulation outputs like splatfacto's dict).
- ``generate_point_cloud`` with optional densify/cull (splat/refine.py).
- ``generate_rgbd_point_cloud`` back-projects rendered depth through the
  intrinsics (reference :374-472).
- ``semantic_relevancy`` implements the LERF-style positive/negative
  paired-softmax scoring over per-gaussian CLIP embeddings (:343-372);
  text embedding is pluggable since this environment has no model weights.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from sim_a_splat_tpu.ops import quaternion as quat
from sim_a_splat_tpu.ops.projection import Camera
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig, rasterize_sh
from sim_a_splat_tpu.ops.transforms import SE3, Sim3
from sim_a_splat_tpu.splat import loaders
from sim_a_splat_tpu.splat.refine import cull_gaussians, split_gaussians
from sim_a_splat_tpu.splat.scene import GaussianScene


def load_dataparser_transform(run_dir: str | Path) -> Sim3:
    """``dataparser_transforms.json`` → Sim3 (the nerfstudio world scale,
    e.g. 0.2112 for the divar scene, SURVEY.md §2)."""
    p = Path(run_dir) / "dataparser_transforms.json"
    if not p.exists():
        return Sim3.identity()
    data = json.loads(p.read_text())
    m = np.eye(4)
    m[:3, :4] = np.asarray(data["transform"], np.float64)
    s = float(data.get("scale", 1.0))
    m[:3] *= s
    return Sim3.from_matrix(m)


@dataclasses.dataclass(frozen=True, eq=False)
class GaussianSplatPipeline:
    scene: GaussianScene
    dataparser: Sim3
    raster: RasterConfig = RasterConfig(tile_capacity=1024, chunk=128)
    dataset: Optional["SplatDataset"] = None   # noqa: F821

    @staticmethod
    def load_run(run_dir: str | Path,
                 raster: RasterConfig = RasterConfig(tile_capacity=1024,
                                                     chunk=128),
                 data_dir: str | Path | None = None,
                 dataset_mode: str = "val"):
        """Load a nerfstudio splatfacto run dir (the ``eval_setup`` path,
        reference :77-82, minus torch/CUDA).  ``data_dir`` (the processed
        dataset dir holding ``transforms.json``) additionally loads the
        dataset split — the reference constructor's ``load_dataset`` +
        ``get_cameras`` steps (nerfstudio_utils.py:71-75, :84-102)."""
        from sim_a_splat_tpu.splat.dataset import load_dataset

        scene = loaders.load_nerfstudio(run_dir)
        dp = load_dataparser_transform(run_dir)
        ds = (load_dataset(data_dir, dataset_mode, dataparser=dp)
              if data_dir is not None else None)
        return GaussianSplatPipeline(
            scene=scene, dataparser=dp, raster=raster, dataset=ds)

    # --- dataset side (reference :84-121) -----------------------------------

    def cameras(self, res_factor: float | None = None) -> list:
        """Render-ready cameras of the loaded split (``get_cameras`` +
        ``rescale_output_resolution``, reference :95-102)."""
        if self.dataset is None:
            raise ValueError("pipeline loaded without data_dir")
        return self.dataset.cameras(res_factor)

    def render_view(self, i: int, res_factor: float | None = None,
                    background=None) -> dict:
        """Render dataset view ``i`` from its own camera — the
        render-the-train-views workflow the reference gets from
        ``get_outputs_for_camera`` on dataset cameras."""
        if self.dataset is None:
            raise ValueError("pipeline loaded without data_dir")
        cam = self.dataset.camera(i, res_factor)
        return self.render(cam.pose, camera=cam, background=background)

    def render(self, pose: SE3, fov_y: float = 1.0, width: int = 640,
               height: int = 480, camera: Camera | None = None,
               background=None) -> dict:
        """Render a camera pose → {"rgb", "depth", "accumulation"} —
        the splatfacto output dict contract (reference :123-177)."""
        cam = camera if camera is not None else Camera.from_fov(
            pose, fov_y, width, height)
        img, aux = rasterize_sh(
            self.scene.means, self.scene.covs(), self.scene.sh_coeffs(),
            self.scene.opacities(), cam, self.scene.sh_degree, self.raster,
            background=background)
        return {"rgb": img, "depth": aux.depth, "accumulation": aux.alpha}

    # --- point clouds (reference :179-341) ---------------------------------

    def generate_point_cloud(
        self,
        use_bounding_box: bool = False,
        bounding_box_min=(-1.0, -1.0, -1.0),
        bounding_box_max=(1.0, 1.0, 1.0),
        densify_scene: bool = False,
        split_params: dict | None = None,
        cull_scene: bool = False,
        cull_params: dict | None = None,
    ) -> dict:
        scene = self.scene
        if densify_scene:
            if cull_scene:
                cp = cull_params or {"cull_alpha_thresh": 0.1,
                                     "cull_scale_thresh": 0.5}
                scene = cull_gaussians(scene, **cp)
            sp = split_params or {"n_split_samples": 2}
            scene = split_gaussians(scene, None, **sp)
        pts = np.asarray(scene.means)
        cols = np.clip(np.asarray(scene.colors_dc()), 0.0, 1.0)
        if use_bounding_box:
            lo = np.asarray(bounding_box_min)
            hi = np.asarray(bounding_box_max)
            m = np.all((pts >= lo) & (pts <= hi), axis=1)
            pts, cols = pts[m], cols[m]
        return {"points": pts, "colors": cols}

    def generate_rgbd_point_cloud(
        self, pose: SE3, fov_y: float = 1.0, width: int = 320,
        height: int = 240, accumulation_thresh: float = 0.3,
    ) -> dict:
        """Back-project rendered depth through the pinhole intrinsics
        (reference :374-472): world-frame colored point cloud of one view."""
        cam = Camera.from_fov(pose, fov_y, width, height)
        out = self.render(pose, camera=cam)
        depth = np.asarray(out["depth"])
        rgb = np.asarray(out["rgb"])
        acc = np.asarray(out["accumulation"])
        u = np.arange(width) + 0.5
        v = np.arange(height) + 0.5
        uu, vv = np.meshgrid(u, v)
        z = depth
        x = (uu - float(cam.cx)) / float(cam.fx) * z
        y = (vv - float(cam.cy)) / float(cam.fy) * z
        pts_cam = np.stack([x, y, z], -1).reshape(-1, 3)
        keep = (acc.reshape(-1) > accumulation_thresh) & (pts_cam[:, 2] > 0)
        R = np.asarray(pose.rotation_matrix())
        t = np.asarray(pose.t)
        pts_world = pts_cam[keep] @ R.T + t
        return {"points": pts_world,
                "colors": np.clip(rgb.reshape(-1, 3)[keep], 0, 1),
                "depth": depth, "rgb": rgb, "accumulation": acc}

    # --- semantics (reference :343-372) ------------------------------------

    @staticmethod
    def semantic_relevancy(
        clip_embeds: np.ndarray,
        positive_embeds: np.ndarray,
        negative_embeds: np.ndarray,
        softmax_temp: float = 10.0,
    ) -> np.ndarray:
        """LERF-style relevancy: for each point, pairwise softmax of the
        positive similarity against every negative; score = min over
        negatives.  Embedding providers are pluggable (no CLIP weights in
        this environment); shapes: (N, D), (P, D), (Q, D) → (N, P)."""
        def norm(a):
            a = np.asarray(a, np.float64)
            return a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True),
                                  1e-12)
        x = norm(clip_embeds)
        pos = norm(positive_embeds)
        neg = norm(negative_embeds)
        sp = x @ pos.T                                      # (N, P)
        sn = x @ neg.T                                      # (N, Q)
        ep = np.exp(softmax_temp * sp)[:, :, None]          # (N, P, 1)
        en = np.exp(softmax_temp * sn)[:, None, :]          # (N, 1, Q)
        rel = ep / (ep + en)                                # (N, P, Q)
        return rel.min(axis=-1)
