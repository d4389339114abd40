"""Static-binning cache renderer ≡ plain rasterizer on the combined scene."""

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops.projection import Camera
from sim_a_splat_tpu.ops.rasterize_cached import (
    build_tile_cache, rasterize_with_cache,
)
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig, rasterize
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.splat import synthetic_scene

CFG = RasterConfig(tile_size=16, tile_capacity=512, max_tiles_per_gaussian=16,
                   chunk=64, sigma_cutoff=3.0)


def setup(n_static=400, n_dyn=60):
    static = synthetic_scene(n_static, seed=0, extent=0.8,
                             scale_range=(0.03, 0.1))
    dyn = synthetic_scene(n_dyn, seed=1, extent=0.4,
                          scale_range=(0.03, 0.08))
    cam = Camera.from_fov(
        SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, -3.0])),
        0.8, 48, 32)
    return static, dyn, cam


def parts(s):
    return s.means, s.covs(), s.colors_dc(), s.opacities()


def test_cached_matches_plain():
    static, dyn, cam = setup()
    sm, sc, scol, sop = parts(static)
    dm, dc, dcol, dop = parts(dyn)

    cache = build_tile_cache(sm, sc, scol, sop, cam, CFG)
    img_c, aux_c = rasterize_with_cache(cache, dm, dc, dcol, dop, cam, CFG,
                                        dyn_capacity=128)
    assert int(aux_c.n_overflowed_tiles) == 0

    comb = (jnp.concatenate([sm, dm]), jnp.concatenate([sc, dc]),
            jnp.concatenate([scol, dcol]), jnp.concatenate([sop, dop]))
    big = CFG._replace(tile_capacity=CFG.tile_capacity + 128)
    img_p, _ = rasterize(*comb, cam, big)
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_p),
                               atol=2e-5, rtol=1e-4)


def test_cached_moving_dynamics():
    # moving the dynamic subset only changes the image accordingly
    static, dyn, cam = setup()
    cache = build_tile_cache(*parts(static), cam, CFG)

    @jax.jit
    def render_at(offset):
        d = dyn._replace(means=dyn.means + offset)
        img, _ = rasterize_with_cache(cache, d.means, d.covs(),
                                      d.colors_dc(), d.opacities(), cam, CFG,
                                      dyn_capacity=128)
        return img

    img0 = render_at(jnp.zeros(3))
    img1 = render_at(jnp.asarray([0.3, 0.0, 0.0]))
    assert float(jnp.abs(img1 - img0).mean()) > 1e-3
    # reference check at the offset position
    d = dyn._replace(means=dyn.means + jnp.asarray([0.3, 0.0, 0.0]))
    comb = (jnp.concatenate([static.means, d.means]),
            jnp.concatenate([static.covs(), d.covs()]),
            jnp.concatenate([static.colors_dc(), d.colors_dc()]),
            jnp.concatenate([static.opacities(), d.opacities()]))
    img_p, _ = rasterize(*comb, cam,
                         CFG._replace(tile_capacity=CFG.tile_capacity + 128))
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img_p),
                               atol=2e-5, rtol=1e-4)


def test_cached_gradients_flow():
    static, dyn, cam = setup(n_static=100, n_dyn=30)
    cache = build_tile_cache(*parts(static), cam, CFG)

    def loss(dmeans):
        d = dyn._replace(means=dmeans)
        img, _ = rasterize_with_cache(cache, d.means, d.covs(),
                                      d.colors_dc(), d.opacities(), cam, CFG,
                                      dyn_capacity=64)
        return jnp.sum(img ** 2)

    g = jax.grad(loss)(dyn.means)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
    # grads also flow into the cached static lists if requested
    g2 = jax.grad(lambda gcol: jnp.sum(rasterize_with_cache(
        cache._replace(gcol=gcol), dyn.means, dyn.covs(), dyn.colors_dc(),
        dyn.opacities(), cam, CFG, dyn_capacity=64)[0] ** 2))(cache.gcol)
    assert float(jnp.abs(g2).max()) > 0
