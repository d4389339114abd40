"""Pallas compositing kernel vs XLA backend (interpret mode on CPU):
forward exact, hand-derived backward vs autodiff on every parameter."""

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops.projection import Camera
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig, rasterize
from sim_a_splat_tpu.ops.rasterize_cached import (
    build_tile_cache, rasterize_with_cache,
)
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.splat import synthetic_scene
import pytest

CFG_X = RasterConfig(tile_capacity=256, chunk=64, sigma_cutoff=3.0)
CFG_P = CFG_X._replace(backend="pallas_interpret", chunk=128)


def setup(n=300):
    scene = synthetic_scene(n, seed=0, extent=0.8, scale_range=(0.03, 0.1))
    cam = Camera.from_fov(
        SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, -3.0])),
        0.8, 48, 32)
    return scene, cam


def test_forward_matches_xla():
    scene, cam = setup()
    args = (scene.means, scene.covs(), scene.colors_dc(), scene.opacities())
    ref, aux_ref = rasterize(*args, cam, CFG_X)
    img, aux = rasterize(*args, cam, CFG_P)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux.alpha), np.asarray(aux_ref.alpha),
                               atol=1e-6)
    m = np.asarray(aux_ref.alpha) > 1e-2
    np.testing.assert_allclose(np.asarray(aux.depth)[m],
                               np.asarray(aux_ref.depth)[m], rtol=1e-5)


@pytest.mark.slow
def test_backward_matches_autodiff_all_params():
    scene, cam = setup(150)
    target = jnp.full((32, 48, 3), 0.4)

    def loss(sc, cfg):
        img, aux = rasterize(sc.means, sc.covs(), sc.colors_dc(),
                             sc.opacities(), cam, cfg)
        # exercise rgb + alpha + depth cotangents
        return (jnp.mean((img - target) ** 2) + 0.1 * jnp.mean(aux.alpha)
                + 0.01 * jnp.mean(jnp.where(aux.alpha > 0.3, aux.depth, 0.0)))

    g_x = jax.grad(lambda s: loss(s, CFG_X))(scene)
    g_p = jax.grad(lambda s: loss(s, CFG_P))(scene)
    for name, a, b in zip(scene._fields, g_x, g_p):
        if a is None:
            continue
        scale = float(jnp.abs(a).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5 * max(scale, 1.0), rtol=2e-3,
                                   err_msg=f"grad mismatch: {name}")


@pytest.mark.slow
def test_pallas_with_static_cache():
    scene, cam = setup(200)
    static = scene.select(jnp.arange(150))
    dyn = scene.select(jnp.arange(150, 200))
    cache = build_tile_cache(static.means, static.covs(), static.colors_dc(),
                             static.opacities(), cam,
                             CFG_P._replace(tile_capacity=256))
    img_p, _ = rasterize_with_cache(
        cache, dyn.means, dyn.covs(), dyn.colors_dc(), dyn.opacities(), cam,
        CFG_P._replace(tile_capacity=256), dyn_capacity=128)
    ref, _ = rasterize(scene.means, scene.covs(), scene.colors_dc(),
                       scene.opacities(), cam,
                       CFG_X._replace(tile_capacity=384))
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
