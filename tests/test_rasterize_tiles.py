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


def test_fast_gather_vjp_matches_default():
    """The sort-based gather VJP (fast_gather_vjp=True) must agree with the
    default scatter-transpose path on image and gradients."""
    scene, covs0, colors, opac = scene_inputs(n=80, seed=7)
    cam = make_camera(width=24, height=24)
    target = jnp.ones((24, 24, 3)) * 0.4
    cfg_fast = CFG._replace(fast_gather_vjp=True)

    def loss(cfg):
        def f(means, covs, colors, opac):
            img, _ = rasterize(means, covs, colors, opac, cam, cfg)
            return jnp.mean((img - target) ** 2)
        return f

    args = (scene.means, covs0, colors, opac)
    img_a, _ = rasterize(*args, cam, CFG)
    img_b, _ = rasterize(*args, cam, cfg_fast)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a),
                               atol=1e-6)
    g_a = jax.grad(loss(CFG), argnums=(0, 1, 2, 3))(*args)
    g_b = jax.grad(loss(cfg_fast), argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_a, g_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-4)


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
