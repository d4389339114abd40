"""Scene-graph parity: world-frame gather-transform posing vs the
reference's splat-frame similarity-conjugated per-link transforms
(splat_handler.py:272-289), verified at the rendered-image level."""

import numpy as np
import jax.numpy as jnp

from sim_a_splat_tpu.ops import quaternion as quat
from sim_a_splat_tpu.ops.transforms import SE3, Sim3
from sim_a_splat_tpu.ops.projection import Camera
from sim_a_splat_tpu.ops.rasterize_reference import render_reference
from sim_a_splat_tpu.scenegraph import (
    SceneGraph, canonicalize, conjugated_link_transform, splat_to_world_pose,
)
from sim_a_splat_tpu.splat import synthetic_scene


def rand_se3(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return SE3(jnp.asarray(q, jnp.float32),
               jnp.asarray(rng.uniform(-0.3, 0.3, 3), jnp.float32))


def rand_sim3(rng, scale):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return Sim3(jnp.asarray(q, jnp.float32),
                jnp.asarray(rng.uniform(-0.5, 0.5, 3), jnp.float32),
                jnp.asarray(scale, jnp.float32))


def render(scene, cam):
    return np.asarray(render_reference(
        scene.means, scene.covs(), scene.colors_dc(), scene.opacities(), cam))


def test_similarity_invariance_of_render():
    # canonicalizing scene + camera through icp⁻¹ must not change the image
    rng = np.random.default_rng(0)
    scene = synthetic_scene(60, seed=1, extent=0.5, scale_range=(0.05, 0.15))
    icp = rand_sim3(rng, 0.21)  # divar-like world scale (SURVEY §2 assets)
    cam_splat = Camera.from_fov(
        SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, -3.0])),
        0.8, 32, 24)
    img_splat = render(scene, cam_splat)

    world = canonicalize(scene, icp)
    cam_world = Camera(
        pose=splat_to_world_pose(cam_splat.pose, icp),
        fx=cam_splat.fx, fy=cam_splat.fy, cx=cam_splat.cx, cy=cam_splat.cy,
        width=cam_splat.width, height=cam_splat.height)
    img_world = render(world, cam_world)
    np.testing.assert_allclose(img_world, img_splat, atol=2e-4)


def test_posed_matches_reference_conjugation():
    # world-frame SceneGraph.posed ≡ reference splat-frame conjugated
    # per-link transforms, at the image level
    rng = np.random.default_rng(3)
    scene_splat = synthetic_scene(90, seed=2, extent=0.5, scale_range=(0.05, 0.12))
    icp = rand_sim3(rng, 0.35)
    n = scene_splat.num_gaussians
    m1 = np.zeros(n, bool); m1[:30] = True
    m2 = np.zeros(n, bool); m2[30:55] = True         # rest static
    x_rest = [rand_se3(rng), rand_se3(rng)]           # capture-time FK poses
    x_now = [rand_se3(rng), rand_se3(rng)]            # current sim poses

    # --- reference path: per-link conjugated transform applied in splat frame
    ref = scene_splat
    for m, xr, xn in zip([m1, m2], x_rest, x_now):
        T = conjugated_link_transform(icp, xn, xr)
        sel = jnp.asarray(m)
        ref = ref._replace(
            means=jnp.where(sel[:, None], T.apply(scene_splat.means), ref.means),
            quats=jnp.where(sel[:, None],
                            quat.multiply(T.q, scene_splat.quats), ref.quats),
        )
    cam_splat = Camera.from_fov(
        SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.1, -2.5])),
        0.9, 36, 28)
    img_ref = render(ref, cam_splat)

    # --- world path: canonicalize once, gather-transform posing
    world = canonicalize(scene_splat, icp)
    rest = SE3(jnp.stack([SE3.identity().q, x_rest[0].q, x_rest[1].q]),
               jnp.stack([SE3.identity().t, x_rest[0].t, x_rest[1].t]))
    graph = SceneGraph.from_masks(world, [m1, m2], rest_poses=rest)
    body_poses = SE3(jnp.stack([SE3.identity().q, x_now[0].q, x_now[1].q]),
                     jnp.stack([SE3.identity().t, x_now[0].t, x_now[1].t]))
    posed = graph.posed(body_poses)
    cam_world = Camera(
        pose=splat_to_world_pose(cam_splat.pose, icp),
        fx=cam_splat.fx, fy=cam_splat.fy, cx=cam_splat.cx, cy=cam_splat.cy,
        width=cam_splat.width, height=cam_splat.height)
    img_world = render(posed, cam_world)
    np.testing.assert_allclose(img_world, img_ref, atol=3e-4)


def test_identity_poses_noop():
    scene = synthetic_scene(40, seed=5)
    n = scene.num_gaussians
    m = np.zeros(n, bool); m[:10] = True
    graph = SceneGraph.from_masks(scene, [m])
    posed = graph.posed(SE3.identity((2,)))
    np.testing.assert_allclose(np.asarray(posed.means),
                               np.asarray(scene.means), atol=1e-6)
    q0 = quat.normalize(scene.quats)
    q1 = quat.normalize(posed.quats)
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(q0 * q1), -1)),
                               1.0, atol=1e-6)


def test_static_gaussians_never_move():
    scene = synthetic_scene(50, seed=6)
    n = scene.num_gaussians
    m = np.zeros(n, bool); m[:20] = True
    graph = SceneGraph.from_masks(scene, [m])
    rng = np.random.default_rng(1)
    mover = rand_se3(rng)
    poses = SE3(jnp.stack([SE3.identity().q, mover.q]),
                jnp.stack([SE3.identity().t, mover.t]))
    posed = graph.posed(poses)
    np.testing.assert_allclose(np.asarray(posed.means[20:]),
                               np.asarray(scene.means[20:]), atol=1e-6)
    assert not np.allclose(np.asarray(posed.means[:20]),
                           np.asarray(scene.means[:20]), atol=1e-4)


def test_mask_priority_last_wins():
    scene = synthetic_scene(10, seed=7)
    a = np.zeros(10, bool); a[:6] = True
    b = np.zeros(10, bool); b[4:8] = True
    graph = SceneGraph.from_masks(scene, [a, b])
    ids = np.asarray(graph.link_ids)
    np.testing.assert_array_equal(ids, [1, 1, 1, 1, 2, 2, 2, 2, 0, 0])


def test_sim3_compose_inverse_roundtrip():
    rng = np.random.default_rng(9)
    s1, s2 = rand_sim3(rng, 0.4), rand_sim3(rng, 2.3)
    x = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(s1.compose(s2).apply(x)),
        np.asarray(s1.apply(s2.apply(x))), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.inverse().apply(s1.apply(x))), np.asarray(x), atol=1e-5)
