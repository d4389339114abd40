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
import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_merge_path_is_exact_permutation():
    """merge_sorted_lists (merge-path counts + permutation gather) must
    equal a plain sort of the concatenated lists, including depth ties and
    inactive padding; its VJP must equal the sort's (a permutation)."""
    from sim_a_splat_tpu.ops.rasterize_cached import (
        TileCache, merge_sorted_lists,
    )

    rng = np.random.default_rng(3)
    T, Ks, Kd = 5, 16, 8

    def make(K, n_active_max):
        depth = np.sort(rng.integers(1, 6, (T, K)).astype(np.float32), 1)
        cnt = rng.integers(0, n_active_max + 1, T)
        active = np.arange(K)[None, :] < cnt[:, None]
        op = np.where(active, rng.uniform(0.1, 0.9, (T, K)), 0.0)
        # inactive padding entries carry arbitrary depths (the
        # gather_tile_lists contract) — keys must come from op, not depth
        depth = np.where(active, depth, rng.uniform(0, 9, (T, K)))
        depth[~active] = np.sort(depth[~active])  # keep rows stable
        xy = rng.normal(size=(T, K, 2))
        conic = rng.normal(size=(T, K, 3))
        col = rng.normal(size=(T, K, 3))
        return TileCache(*(jnp.asarray(a, jnp.float32) for a in
                           (xy, conic, col, op, depth)),
                         jnp.asarray(cnt, jnp.int32))

    static, dyn = make(Ks, Ks), make(Kd, Kd)
    merged = merge_sorted_lists(static, dyn)

    # golden: multi-operand stable sort by (inactive, depth)
    key = np.where(np.asarray(merged.gop) > 0, np.asarray(merged.gdepth),
                   np.inf)
    # the un-merged concatenation for the golden path
    cat = lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)], 1)
    op0 = cat(static.gop, dyn.gop)
    dep0 = cat(static.gdepth, dyn.gdepth)
    key0 = np.where(op0 > 0, dep0, np.inf)
    order = np.argsort(key0, axis=1, kind="stable")
    np.testing.assert_allclose(
        np.take_along_axis(np.sort(key0, 1), np.zeros((T, 1), int), 1),
        np.take_along_axis(np.sort(key, 1), np.zeros((T, 1), int), 1))
    for name in ("gxy", "gconic", "gcol", "gop", "gdepth"):
        gold = np.take_along_axis(
            cat(getattr(static, name), getattr(dyn, name)),
            order[..., None] if getattr(static, name).ndim == 3 else order,
            axis=1)
        got = np.asarray(getattr(merged, name))
        # merged actives must match exactly; padding region must carry the
        # same multiset but order between equal +inf keys may differ —
        # compare opacity-weighted (padding has op 0, contributes nothing)
        w = gold if name == "gop" else gold * (np.asarray(
            np.take_along_axis(op0, order, 1))[..., None]
            if gold.ndim == 3 else np.take_along_axis(op0, order, 1))
        w2 = got if name == "gop" else got * (np.asarray(merged.gop)[..., None]
                                              if got.ndim == 3 else
                                              np.asarray(merged.gop))
        np.testing.assert_allclose(w2, w, atol=1e-6)

    # VJP: gradient through the merge must match the autodiff of a plain
    # take_along_axis by the same permutation
    def loss_merge(gcol_s, gcol_d):
        m = merge_sorted_lists(static._replace(gcol=gcol_s),
                               dyn._replace(gcol=gcol_d))
        wts = jnp.asarray(np.cos(np.arange(Ks + Kd)), jnp.float32)
        return jnp.sum(m.gcol * m.gop[..., None] * wts[None, :, None])

    g_s, g_d = jax.grad(loss_merge, argnums=(0, 1))(static.gcol, dyn.gcol)

    def loss_gold(gcol_s, gcol_d):
        gcol = jnp.concatenate([gcol_s, gcol_d], 1)
        mcol = jnp.take_along_axis(gcol, jnp.asarray(order)[..., None], 1)
        mop = jnp.take_along_axis(jnp.asarray(op0, jnp.float32),
                                  jnp.asarray(order), 1)
        wts = jnp.asarray(np.cos(np.arange(Ks + Kd)), jnp.float32)
        return jnp.sum(mcol * mop[..., None] * wts[None, :, None])

    gg_s, gg_d = jax.grad(loss_gold, argnums=(0, 1))(static.gcol, dyn.gcol)
    # weight by op: padding-slot order may differ between the two merges
    sop = np.asarray(static.gop)[..., None]
    dop = np.asarray(dyn.gop)[..., None]
    np.testing.assert_allclose(np.asarray(g_s) * sop, np.asarray(gg_s) * sop,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_d) * dop, np.asarray(gg_d) * dop,
                               atol=1e-6)


@pytest.mark.slow
def test_static_skip_exact():
    """static_composite whole-tile skipping must not change the image or
    the gradients: tiles with zero dynamic entries reuse the once-per-step
    static composite, which is bit-identical to re-compositing them
    (pallas interpret backend so the skip predicate path itself runs)."""
    from sim_a_splat_tpu.ops.rasterize_cached import build_static_composite

    cfg = CFG._replace(tile_capacity=128, chunk=128,
                       backend="pallas_interpret")
    static, dyn, cam = setup(n_static=300, n_dyn=12)
    # shrink + shift the dynamic cluster so a good share of tiles have no
    # dynamic entries (the skip path must actually trigger)
    dyn = dyn._replace(means=0.2 * dyn.means + jnp.asarray([0.5, 0.3, 0.0]),
                       log_scales=dyn.log_scales - 1.0)
    cache = build_tile_cache(*parts(static), cam, cfg)
    scomp = build_static_composite(cache, cam, cfg)

    def render(dmeans, sc):
        img, aux = rasterize_with_cache(
            cache, dmeans, dyn.covs(), dyn.colors_dc(), dyn.opacities(),
            cam, cfg, dyn_capacity=128, static_composite=sc)
        return img

    img_skip = render(dyn.means, scomp)
    img_full = render(dyn.means, None)
    np.testing.assert_allclose(np.asarray(img_skip), np.asarray(img_full),
                               atol=1e-6)

    g_skip = jax.grad(lambda m: jnp.sum(render(m, scomp) ** 2))(dyn.means)
    g_full = jax.grad(lambda m: jnp.sum(render(m, None) ** 2))(dyn.means)
    np.testing.assert_allclose(np.asarray(g_skip), np.asarray(g_full),
                               atol=1e-5, rtol=1e-4)

    # gradient into the static scene flows through BOTH the merged
    # composite (touched tiles) and the static composite (skipped tiles)
    def loss_static(gcol):
        c = cache._replace(gcol=gcol)
        sc = build_static_composite(c, cam, cfg)
        img, _ = rasterize_with_cache(
            c, dyn.means, dyn.covs(), dyn.colors_dc(), dyn.opacities(),
            cam, cfg, dyn_capacity=128, static_composite=sc)
        return jnp.sum(img ** 2)

    def loss_static_full(gcol):
        c = cache._replace(gcol=gcol)
        img, _ = rasterize_with_cache(
            c, dyn.means, dyn.covs(), dyn.colors_dc(), dyn.opacities(),
            cam, cfg, dyn_capacity=128)
        return jnp.sum(img ** 2)

    gs = jax.grad(loss_static)(cache.gcol)
    gf = jax.grad(loss_static_full)(cache.gcol)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                               atol=1e-5, rtol=1e-4)
