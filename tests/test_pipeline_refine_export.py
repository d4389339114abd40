"""Splat pipeline / refinement / export parity tests (reference C5, C4)."""

import numpy as np
import jax.numpy as jnp

from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.splat import (
    GaussianScene, GaussianSplatPipeline, cull_gaussians, ellipsoid_mesh,
    load_ply, save_ply, split_gaussians, synthetic_scene,
)
from sim_a_splat_tpu.splat.pipeline import load_dataparser_transform
import pytest


def make_pipeline(n=80, sh_degree=1):
    from sim_a_splat_tpu.ops.transforms import Sim3
    scene = synthetic_scene(n, seed=0, extent=0.5, sh_degree=sh_degree,
                            scale_range=(0.05, 0.12))
    return GaussianSplatPipeline(scene=scene, dataparser=Sim3.identity())


def cam_pose(z=-3.0):
    return SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, z]))


@pytest.mark.slow
def test_render_output_contract():
    p = make_pipeline()
    out = p.render(cam_pose(), fov_y=0.8, width=48, height=32)
    assert out["rgb"].shape == (32, 48, 3)
    assert out["depth"].shape == (32, 48)
    assert out["accumulation"].shape == (32, 48)
    assert 0.0 <= float(out["accumulation"].max()) <= 1.0 + 1e-5


def test_point_cloud_and_bounding_box():
    p = make_pipeline()
    pc = p.generate_point_cloud()
    assert pc["points"].shape == (80, 3)
    box = p.generate_point_cloud(use_bounding_box=True,
                                 bounding_box_min=(-0.2, -0.2, -0.2),
                                 bounding_box_max=(0.2, 0.2, 0.2))
    assert len(box["points"]) < 80
    assert np.all(np.abs(box["points"]) <= 0.2)


def test_densify_and_cull_counts():
    p = make_pipeline()
    dense = p.generate_point_cloud(densify_scene=True,
                                   split_params={"n_split_samples": 3})
    assert len(dense["points"]) == 3 * 80
    # cull everything transparent: force most opacities low
    scene = p.scene._replace(
        logit_opacities=p.scene.logit_opacities.at[:60].set(-5.0))
    culled = cull_gaussians(scene, cull_alpha_thresh=0.1)
    assert culled.num_gaussians == 20


def test_split_keeps_distribution():
    scene = synthetic_scene(30, seed=2, scale_range=(0.01, 0.02))
    out = split_gaussians(scene, None, n_split_samples=4, seed=0)
    assert out.num_gaussians == 120
    # children near their parents (scales are tiny)
    parents = np.tile(np.asarray(scene.means), (4, 1))
    d = np.linalg.norm(np.asarray(out.means) - parents, axis=-1)
    assert d.max() < 0.2
    np.testing.assert_allclose(np.asarray(out.scales()),
                               np.tile(np.asarray(scene.scales()), (4, 1)) / 1.6,
                               rtol=1e-5)


@pytest.mark.slow
def test_rgbd_backprojection_geometry():
    # single small gaussian at origin, camera at -2: back-projected points
    # must sit near the origin
    scene = GaussianScene(
        means=jnp.zeros((1, 3)),
        quats=jnp.asarray([[1.0, 0, 0, 0]]),
        log_scales=jnp.full((1, 3), np.log(0.05)),
        logit_opacities=jnp.asarray([4.0]),
        sh_dc=jnp.zeros((1, 3)),
    )
    from sim_a_splat_tpu.ops.transforms import Sim3
    p = GaussianSplatPipeline(scene=scene, dataparser=Sim3.identity())
    out = p.generate_rgbd_point_cloud(cam_pose(-2.0), fov_y=0.6,
                                      width=64, height=64,
                                      accumulation_thresh=0.5)
    pts = out["points"]
    assert len(pts) > 10
    assert np.linalg.norm(pts, axis=-1).max() < 0.2


def test_semantic_relevancy_math():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1, 8))
    neg = rng.normal(size=(3, 8))
    # embeddings exactly equal to the positive → relevancy near 1
    x = np.concatenate([pos, neg[:1]], axis=0)
    rel = GaussianSplatPipeline.semantic_relevancy(x, pos, neg)
    assert rel.shape == (2, 1)
    assert rel[0, 0] > 0.9
    assert rel[1, 0] < 0.5


def test_ply_roundtrip(tmp_path):
    scene = synthetic_scene(25, seed=3, sh_degree=2)
    save_ply(tmp_path / "s.ply", scene)
    back = load_ply(tmp_path / "s.ply")
    for a, b in zip(scene, back):
        if a is None:
            assert b is None
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


def test_ellipsoid_mesh_export(tmp_path):
    scene = synthetic_scene(10, seed=4)
    mesh, colors = ellipsoid_mesh(scene, subdivisions=0)
    assert len(mesh.vertices) == 10 * 12
    assert len(colors) == len(mesh.vertices)
    from sim_a_splat_tpu.splat import save_ellipsoid_ply
    save_ellipsoid_ply(tmp_path / "e.ply", scene, subdivisions=0)
    txt = (tmp_path / "e.ply").read_text().splitlines()
    assert txt[0] == "ply"
    assert any("element vertex 120" in l for l in txt)


def test_dataparser_transform_json(tmp_path):
    import json
    (tmp_path / "dataparser_transforms.json").write_text(json.dumps({
        "transform": [[1, 0, 0, 0.5], [0, 1, 0, 0], [0, 0, 1, 0]],
        "scale": 0.2112,
    }))
    sim3 = load_dataparser_transform(tmp_path)
    np.testing.assert_allclose(float(sim3.s), 0.2112, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sim3.t),
                               [0.5 * 0.2112, 0, 0], atol=1e-6)
