"""Dataset-side pipeline: nerfstudio transforms.json parsing, the exact
fraction split, OpenGL→OpenCV camera conversion, dataparser application —
including an integration check against the reference's REAL divar
transforms.json (/root/reference/assets/divar113vhw/transforms.json)."""

import json
import math
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from sim_a_splat_tpu.ops import Camera, SE3
from sim_a_splat_tpu.ops.transforms import Sim3
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
from sim_a_splat_tpu.splat import (
    GaussianSplatPipeline, load_dataset, save_npz, synthetic_scene,
    train_eval_split_fraction,
)

REF_DIVAR = Path("/root/reference/assets/divar113vhw")


def make_run(tmp_path, n_frames=12, w=32, h=24):
    """Synthetic nerfstudio-format data dir + run dir."""
    from PIL import Image

    data = tmp_path / "data"
    (data / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    fy = 0.5 * h / math.tan(0.5 * 0.8)
    for i in range(n_frames):
        # camera on -z axis looking at the origin: OpenGL R = diag(1,-1,-1)
        c2w = np.eye(4)
        c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])
        c2w[:3, 3] = [0.0, 0.0, -3.0 - 0.1 * i]
        name = f"images/frame_{i:05d}.png"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(data / name)
        frames.append({"file_path": name,
                       "transform_matrix": c2w.tolist()})
    meta = {"w": w, "h": h, "fl_x": fy, "fl_y": fy, "cx": w / 2.0,
            "cy": h / 2.0, "camera_model": "OPENCV", "frames": frames}
    (data / "transforms.json").write_text(json.dumps(meta))

    run = tmp_path / "run"
    run.mkdir()
    (run / "dataparser_transforms.json").write_text(json.dumps(
        {"transform": np.eye(4)[:3].tolist(), "scale": 1.0}))
    scene = synthetic_scene(n=50, seed=3, extent=0.8, scale_range=(0.05, 0.15))
    save_npz(run / "splat.npz", scene)
    return data, run, scene


def test_split_matches_nerfstudio():
    # nerfstudio: num_train = ceil(0.9 n), indices = linspace(0, n-1, dtype=int)
    i_train, i_eval = train_eval_split_fraction(10)
    assert len(i_train) == 9 and len(i_eval) == 1
    assert len(np.intersect1d(i_train, i_eval)) == 0
    i_train, i_eval = train_eval_split_fraction(293)
    assert len(i_train) == math.ceil(293 * 0.9) == 264
    assert len(i_eval) == 29


def test_load_dataset_splits_and_images(tmp_path):
    data, run, scene = make_run(tmp_path)
    ds_all = load_dataset(data, "all")
    ds_tr = load_dataset(data, "train")
    ds_ev = load_dataset(data, "val")
    assert len(ds_all) == 12
    assert len(ds_tr) + len(ds_ev) == 12
    assert len(ds_tr) == math.ceil(12 * 0.9)
    img = ds_tr.get_image_float32(0)
    assert img.shape == (24, 32, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    H, W, K = ds_tr.get_camera_intrinsics(0)
    assert (H, W) == (24, 32)
    np.testing.assert_allclose(K[0, 0], ds_tr.fx[0])
    assert ds_all.get_poses().shape == (12, 4, 4)


def test_dataset_camera_renders_like_direct_camera(tmp_path):
    """The GL→CV conversion: a dataset camera must produce the same image
    as the hand-built OpenCV camera it encodes."""
    from sim_a_splat_tpu.ops.rasterize_tiles import rasterize

    data, run, scene = make_run(tmp_path)
    ds = load_dataset(data, "all")
    cam = ds.camera(0)
    cfg = RasterConfig(tile_size=16, tile_capacity=64,
                       max_tiles_per_gaussian=9, chunk=32, sigma_cutoff=3.0)
    img_ds, _ = rasterize(scene.means, scene.covs(), scene.colors_dc(),
                          scene.opacities(), cam, cfg)
    cam_direct = Camera.from_fov(
        SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, -3.0])),
        0.8, 32, 24)
    img_direct, _ = rasterize(scene.means, scene.covs(), scene.colors_dc(),
                              scene.opacities(), cam_direct, cfg)
    assert float(jnp.abs(img_ds).max()) > 0.01  # something rendered
    np.testing.assert_allclose(np.asarray(img_ds), np.asarray(img_direct),
                               atol=1e-5)


def test_dataparser_sim3_applied(tmp_path):
    data, run, scene = make_run(tmp_path)
    dp = Sim3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, 0.0]),
              jnp.asarray(0.5))
    ds = load_dataset(data, "all", dataparser=dp)
    pose = ds.model_pose(0)
    np.testing.assert_allclose(np.asarray(pose.t), [0, 0, -1.5], atol=1e-6)


def test_pipeline_with_dataset(tmp_path):
    data, run, scene = make_run(tmp_path)
    # pipeline load path uses the nerfstudio ckpt loader; point it at the
    # npz fallback via the loaders.load dispatcher instead
    from sim_a_splat_tpu.splat import load_npz
    from sim_a_splat_tpu.splat.pipeline import GaussianSplatPipeline
    from sim_a_splat_tpu.splat.dataset import load_dataset as ld

    pipe = GaussianSplatPipeline(
        scene=load_npz(run / "splat.npz"),
        dataparser=Sim3.identity(),
        raster=RasterConfig(tile_size=16, tile_capacity=64,
                            max_tiles_per_gaussian=9, chunk=32),
        dataset=ld(data, "val"),
    )
    cams = pipe.cameras()
    assert len(cams) == len(pipe.dataset)
    out = pipe.render_view(0)
    assert out["rgb"].shape == (24, 32, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()


@pytest.mark.skipif(not (REF_DIVAR / "transforms.json").exists(),
                    reason="reference assets unavailable")
def test_real_divar_transforms():
    """Integration: parse the reference's real 293-frame divar dataset and
    its trained run's dataparser transform."""
    from sim_a_splat_tpu.splat.pipeline import load_dataparser_transform

    run_dirs = sorted((REF_DIVAR / "splatfacto").glob("*"))
    dp = load_dataparser_transform(run_dirs[0]) if run_dirs else Sim3.identity()
    ds_tr = load_dataset(REF_DIVAR, "train", dataparser=dp)
    ds_ev = load_dataset(REF_DIVAR, "val", dataparser=dp)
    assert len(ds_tr) == 264 and len(ds_ev) == 29
    np.testing.assert_allclose(ds_tr.fx[0], 1787.1656135439252)
    H, W, K = ds_tr.get_camera_intrinsics(0)
    assert (H, W) == (1920, 1080)
    cam = ds_ev.camera(0, res_factor=0.1)
    assert cam.width == 108 and cam.height == 192
    # dataparser scale (SURVEY §2: divar world scale 0.2112) lands in the
    # model-frame pose magnitude
    assert np.isfinite(np.asarray(cam.pose.t)).all()
    if run_dirs:
        np.testing.assert_allclose(float(dp.s), 0.2112, atol=5e-4)
