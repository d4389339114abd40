"""Fused static+dynamic interleaved composite ≡ merge + composite.

The merge-free kernel (ops/pallas_composite_pair.py) must reproduce the
merged-list path bit-for-bit up to fp32 rounding, forward and backward,
including the static-before-dynamic tie-break and count/skip handling.
Runs in pallas interpret mode on the CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sim_a_splat_tpu.ops.projection import Camera
from sim_a_splat_tpu.ops.rasterize_cached import (
    build_tile_cache, build_static_composite, rasterize_with_cache,
)
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig, rasterize
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.splat import synthetic_scene

CFG = RasterConfig(tile_size=16, tile_capacity=256,
                   max_tiles_per_gaussian=16, chunk=128, sigma_cutoff=3.0,
                   backend="pallas_interpret", fused_pair=True)
CFG_MERGE = CFG._replace(fused_pair=False, backend="xla")


def setup(n_static=300, n_dyn=80):
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


@pytest.mark.parametrize("term_eps", [None, 1e-4])
def test_pair_matches_merge_forward(term_eps):
    static, dyn, cam = setup()
    cache = build_tile_cache(*parts(static), cam, CFG)
    img_f, aux_f = rasterize_with_cache(
        cache, *parts(dyn), cam, CFG._replace(term_eps=term_eps),
        dyn_capacity=128)
    img_m, aux_m = rasterize_with_cache(
        cache, *parts(dyn), cam, CFG_MERGE, dyn_capacity=128)
    tol = 2e-5 if term_eps is None else 2e-4
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_m),
                               atol=tol, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(aux_f.tile_counts),
                                  np.asarray(aux_m.tile_counts))


def test_pair_matches_plain_rasterizer():
    # end-to-end: fused cached render == one-shot render of the union scene
    static, dyn, cam = setup()
    cache = build_tile_cache(*parts(static), cam, CFG)
    img_f, _ = rasterize_with_cache(cache, *parts(dyn), cam, CFG,
                                    dyn_capacity=128)
    sm, sc, scol, sop = parts(static)
    dm, dc, dcol, dop = parts(dyn)
    comb = (jnp.concatenate([sm, dm]), jnp.concatenate([sc, dc]),
            jnp.concatenate([scol, dcol]), jnp.concatenate([sop, dop]))
    img_p, _ = rasterize(*comb, cam,
                         CFG_MERGE._replace(tile_capacity=384))
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_p),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("static_skip", [False, True])
@pytest.mark.slow
def test_pair_gradients_match_merge(static_skip):
    static, dyn, cam = setup(n_static=200, n_dyn=50)

    def loss_with(cfg, use_skip):
        def f(sm, dm, dcol, dop):
            sc = static.covs()
            cache = build_tile_cache(sm, sc, static.colors_dc(),
                                     static.opacities(), cam, cfg)
            scomp = (build_static_composite(cache, cam, cfg)
                     if use_skip else None)
            img, _ = rasterize_with_cache(
                cache, dm, dyn.covs(), dcol, dop, cam, cfg,
                dyn_capacity=128, static_composite=scomp)
            # anisotropic pixel weighting exercises all gradient paths
            w = jnp.linspace(0.5, 1.5, img.shape[0])[:, None, None]
            return jnp.sum(w * img ** 2)
        return f

    args = (static.means, dyn.means, dyn.colors_dc(), dyn.opacities())
    gf = jax.grad(loss_with(CFG, static_skip), argnums=(0, 1, 2, 3))(*args)
    gm = jax.grad(loss_with(CFG_MERGE, static_skip),
                  argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gf, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-3)


@pytest.mark.slow
def test_pair_vmap_shared_static():
    # the production shape: one static cache shared by a vmapped env batch
    static, dyn, cam = setup(n_static=200, n_dyn=40)
    cache = build_tile_cache(*parts(static), cam, CFG)
    scomp = build_static_composite(cache, cam, CFG)
    offsets = jnp.asarray([[0.0, 0, 0], [0.1, 0, 0], [0, -0.1, 0]])

    def render(off):
        d = dyn._replace(means=dyn.means + off)
        img, _ = rasterize_with_cache(cache, d.means, d.covs(),
                                      d.colors_dc(), d.opacities(), cam,
                                      CFG, dyn_capacity=128,
                                      static_composite=scomp)
        return img

    imgs_v = jax.vmap(render)(offsets)
    for i, off in enumerate(offsets):
        np.testing.assert_allclose(np.asarray(imgs_v[i]),
                                   np.asarray(render(off)),
                                   atol=2e-5, rtol=1e-4)


def test_pair_term_eps_error_bound():
    # early termination changes the image by at most O(term_eps)
    static, dyn, cam = setup()
    cache = build_tile_cache(*parts(static), cam, CFG)
    img_exact, _ = rasterize_with_cache(cache, *parts(dyn), cam, CFG,
                                        dyn_capacity=128)
    img_term, _ = rasterize_with_cache(
        cache, *parts(dyn), cam, CFG._replace(term_eps=1e-3),
        dyn_capacity=128)
    assert float(jnp.max(jnp.abs(img_exact - img_term))) < 5e-3
