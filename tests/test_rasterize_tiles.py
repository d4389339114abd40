"""Tile rasterizer vs the dense golden renderer: images, gradients, aux.

With ``sigma_cutoff`` applied to both, the tile pipeline's implicit bbox
truncation matches the reference's explicit nσ cutoff, so images agree to
fp32 reassociation tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.ops.projection import Camera
from sim_a_splat_tpu.ops.rasterize_reference import render_reference
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig, rasterize, rasterize_sh
from sim_a_splat_tpu.splat import synthetic_scene
import pytest

CFG = RasterConfig(tile_size=16, tile_capacity=512, max_tiles_per_gaussian=16,
                   chunk=64, sigma_cutoff=3.0)


def make_camera(width=40, height=28, fov=0.8, z=-3.0):
    pose = SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, z]))
    return Camera.from_fov(pose, fov, width, height)


def scene_inputs(n=300, seed=0, **kw):
    scene = synthetic_scene(n, seed=seed, extent=0.8,
                            scale_range=(0.03, 0.12), **kw)
    return scene, scene.covs(), scene.colors_dc(), scene.opacities()


def test_matches_reference_image():
    scene, covs, colors, opac = scene_inputs()
    for w, h in [(40, 28), (16, 16), (8, 8), (33, 47)]:
        cam = make_camera(width=w, height=h)
        ref = render_reference(scene.means, covs, colors, opac, cam,
                               sigma_cutoff=3.0)
        img, aux = rasterize(scene.means, covs, colors, opac, cam, CFG)
        assert int(aux.n_overflowed_tiles) == 0
        assert int(aux.n_slot_truncated) == 0
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_matches_reference_with_background_and_depth():
    scene, covs, colors, opac = scene_inputs(n=120, seed=4)
    cam = make_camera(width=32, height=32)
    bg = jnp.asarray([0.3, 0.1, 0.6])
    ref, ref_depth, ref_alpha = render_reference(
        scene.means, covs, colors, opac, cam, background=bg,
        return_depth=True, sigma_cutoff=3.0)
    img, aux = rasterize(scene.means, covs, colors, opac, cam, CFG, background=bg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(aux.alpha), np.asarray(ref_alpha),
                               atol=3e-5, rtol=1e-4)
    m = np.asarray(ref_alpha) > 1e-2  # depth is alpha-normalized; compare where defined
    np.testing.assert_allclose(np.asarray(aux.depth)[m], np.asarray(ref_depth)[m],
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_gradients_match_reference():
    scene, covs0, colors, opac = scene_inputs(n=80, seed=2)
    cam = make_camera(width=24, height=24)
    target = jnp.ones((24, 24, 3)) * 0.5

    def loss_ref(means, covs, colors, opac):
        img = render_reference(means, covs, colors, opac, cam, sigma_cutoff=3.0)
        return jnp.mean((img - target) ** 2)

    def loss_tile(means, covs, colors, opac):
        img, _ = rasterize(means, covs, colors, opac, cam, CFG)
        return jnp.mean((img - target) ** 2)

    args = (scene.means, covs0, colors, opac)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_tile = jax.grad(loss_tile, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_ref, g_tile):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=5e-3)


@pytest.mark.slow
def test_bucketed_binning_matches_uniform():
    """Radius-bucketed binning (config.buckets) must produce the same image
    and gradients as the uniform-M path when no bucket truncates."""
    scene, covs0, colors, opac = scene_inputs(n=200, seed=7)
    cam = make_camera(width=48, height=48)
    target = jnp.ones((48, 48, 3)) * 0.4
    # generous buckets: big-footprint 1/4 of gaussians get the full M,
    # the rest get 6 slots — no truncation for this scene (asserted)
    cfg_b = CFG._replace(buckets=((6, 0.75), (16, 0.25)))

    def loss(cfg):
        def f(means, covs, colors, opac):
            img, _ = rasterize(means, covs, colors, opac, cam, cfg)
            return jnp.mean((img - target) ** 2)
        return f

    args = (scene.means, covs0, colors, opac)
    img_a, aux_a = rasterize(*args, cam, CFG)
    img_b, aux_b = rasterize(*args, cam, cfg_b)
    assert int(aux_a.n_slot_truncated) == 0
    assert int(aux_b.n_slot_truncated) == 0
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(aux_b.tile_counts),
                                  np.asarray(aux_a.tile_counts))
    g_a = jax.grad(loss(CFG), argnums=(0, 1, 2, 3))(*args)
    g_b = jax.grad(loss(cfg_b), argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_a, g_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-4)


def test_bucketed_binning_truncation_accounting():
    """A too-small bucket drops farthest-from-origin bbox tiles and reports
    every truncated gaussian in aux.n_slot_truncated."""
    scene, covs0, colors, opac = scene_inputs(n=200, seed=7)
    cam = make_camera(width=48, height=48)
    cfg_tiny = CFG._replace(buckets=((1, 1.0),))           # 1 slot for all
    _, aux = rasterize(scene.means, covs0, colors, opac, cam, cfg_tiny)
    # the generous-bucket run above shows this scene has multi-tile
    # footprints, so the 1-slot bucket must report truncation
    assert int(aux.n_slot_truncated) > 0


def test_project_raw_matches_project():
    """project_raw (fused covariance+projection from raw params) must match
    project(means, compute_cov(quats, scales)) exactly, values and grads."""
    from sim_a_splat_tpu.ops.covariance import compute_cov
    from sim_a_splat_tpu.ops.projection import project, project_raw

    scene, _, _, _ = scene_inputs(n=150, seed=9)
    cam = make_camera(width=32, height=32)
    p1 = project(scene.means, compute_cov(scene.quats, scene.scales()), cam)
    p2 = project_raw(scene.means, scene.quats, scene.log_scales, cam)
    np.testing.assert_allclose(np.asarray(p2.xy), np.asarray(p1.xy),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2.conic), np.asarray(p1.conic),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p2.valid), np.asarray(p1.valid))
    np.testing.assert_array_equal(np.asarray(p2.radius), np.asarray(p1.radius))

    def loss(fn):
        def f(means, quats, log_scales):
            p = fn(means, quats, log_scales)
            w = p.valid[:, None]
            return (jnp.sum(jnp.where(w, p.xy, 0.0) ** 2)
                    + jnp.sum(jnp.where(w, p.conic, 0.0)))
        return f

    f1 = loss(lambda m, q, s: project(m, compute_cov(q, jnp.exp(s)), cam))
    f2 = loss(lambda m, q, s: project_raw(m, q, s, cam))
    args = (scene.means, scene.quats, scene.log_scales)
    g1 = jax.grad(f1, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_sh_path_matches_reference():
    from sim_a_splat_tpu.ops.rasterize_reference import render_reference_sh

    scene, covs, _, opac = scene_inputs(n=60, seed=5, sh_degree=2)
    cam = make_camera(width=24, height=16)
    ref = render_reference_sh(scene.means, covs, scene.sh_coeffs(), opac,
                              cam, 2, sigma_cutoff=3.0)
    img, _ = rasterize_sh(scene.means, covs, scene.sh_coeffs(), opac, cam, 2, CFG)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_capacity_truncation_keeps_nearest():
    # 20 gaussians stacked along z on the optical axis; tiny capacity keeps
    # the nearest 4 ⇒ the front (red) gaussian dominates the center pixel.
    n = 20
    means = jnp.stack([jnp.zeros(n), jnp.zeros(n),
                       jnp.linspace(0.0, 1.0, n)], axis=-1)
    covs = jnp.tile(jnp.eye(3) * 0.05**2, (n, 1, 1))
    colors = jnp.zeros((n, 3)).at[0, 0].set(1.0).at[1:, 1].set(1.0)
    opac = jnp.full((n,), 0.7).at[0].set(0.99)
    cam = make_camera(width=16, height=16, z=-2.0)
    cfg = RasterConfig(tile_size=16, tile_capacity=4, max_tiles_per_gaussian=4,
                       chunk=4, sigma_cutoff=3.0)
    img, aux = rasterize(means, covs, colors, opac, cam, cfg)
    assert int(aux.n_overflowed_tiles) >= 1
    # front red survives truncation and occludes the greens behind it
    assert float(img[8, 8, 0]) > 0.3
    assert float(img[8, 8, 0]) > float(img[8, 8, 1])
    assert np.isfinite(np.asarray(img)).all()


def test_vmap_over_cameras():
    scene, covs, colors, opac = scene_inputs(n=100, seed=3)
    zs = jnp.asarray([-2.5, -3.0, -3.5])

    def render_at(z):
        pose = SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.stack([z * 0, z * 0, z]))
        cam = Camera.from_fov(pose, 0.8, 24, 24)
        img, _ = rasterize(scene.means, covs, colors, opac, cam, CFG)
        return img

    batched = jax.jit(jax.vmap(render_at))(zs)
    assert batched.shape == (3, 24, 24, 3)
    for i, z in enumerate(zs):
        single = render_at(z)
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single),
                                   atol=1e-5, rtol=1e-4)


def test_empty_and_all_culled():
    cam = make_camera(width=16, height=16)
    cfg = RasterConfig(tile_size=16, tile_capacity=8, max_tiles_per_gaussian=4,
                       chunk=8)
    # all behind camera
    means = jnp.asarray([[0.0, 0.0, -50.0], [1.0, 1.0, -10.0]])
    covs = jnp.tile(jnp.eye(3) * 1e-4, (2, 1, 1))
    img, aux = rasterize(means, covs, jnp.ones((2, 3)), jnp.ones(2), cam, cfg,
                         background=jnp.asarray([0.1, 0.2, 0.3]))
    np.testing.assert_allclose(np.asarray(img),
                               np.tile([0.1, 0.2, 0.3], (16, 16, 1)), atol=1e-6)
    assert int(jnp.sum(aux.tile_counts)) == 0
