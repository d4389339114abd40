"""Moving-camera candidate cache ≡ full per-frame rebin.

The frame-coherent moving path (ops/rasterize_moving.py) must reproduce
the full-rebin render — same projection math, same SH, same compositing —
whenever the camera stays within the cache's margin budget and nothing is
capacity-truncated.  This is the exactness contract that lets the env
wrapper swap the expensive per-frame rebin (the reference's EEF-camera
loop, splat_env_wrapper.py:140-159) for the cached path.

Runs in pallas interpret mode on CPU (tests/conftest.py forces the cpu
platform); it also exercises the per-env-static mode and the dyn-free
chunk specialization of the selected-tile kernel, which the fixed-camera
sel path never reaches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sim_a_splat_tpu.ops import sh as sh_ops
from sim_a_splat_tpu.ops.projection import Camera, Projected, project_raw, view_directions
from sim_a_splat_tpu.ops.rasterize_moving import (
    MovingCache, build_moving_cache, camera_budget_used,
    dilated_build_config, render_moving_batch,
)
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig, render_binned
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.splat import synthetic_scene

CFG = RasterConfig(tile_size=16, tile_capacity=256,
                   max_tiles_per_gaussian=9, chunk=128, sigma_cutoff=3.0,
                   backend="pallas_interpret")
MARGIN = 4.0


def setup(sh_degree=1, n_static=180, n_dyn=40):
    static = synthetic_scene(n_static, seed=0, extent=0.8,
                             scale_range=(0.02, 0.06), sh_degree=sh_degree)
    dyn = synthetic_scene(n_dyn, seed=1, extent=0.3,
                          scale_range=(0.02, 0.05), sh_degree=sh_degree)
    cam = Camera.from_fov(
        SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, -3.0])),
        0.8, 48, 32)
    return static, dyn, cam


def cam_at(t, q=(1.0, 0.0, 0.0, 0.0)):
    return Camera.from_fov(SE3(jnp.asarray(q, jnp.float32),
                               jnp.asarray(t, jnp.float32)), 0.8, 48, 32)


def build(static, cam, cfg=CFG, margin=MARGIN, kc=256):
    sh_flat = static.sh_coeffs().reshape(static.means.shape[0], -1)
    return build_moving_cache(
        static.means, static.quats, static.log_scales, sh_flat,
        static.opacities(), cam, dilated_build_config(cfg, margin),
        kc=kc, margin=margin)


def rebin_reference(static, dyn, cam, sh_degree, cfg=CFG):
    """The moving path of the env wrapper: full per-frame rebin."""
    ps = project_raw(static.means, static.quats, static.log_scales, cam)
    pd = project_raw(dyn.means, dyn.quats, dyn.log_scales, cam)
    proj = Projected(*[jnp.concatenate([a, b]) for a, b in zip(ps, pd)])
    means_all = jnp.concatenate([static.means, dyn.means])
    dirs = view_directions(means_all, cam)
    sh_all = jnp.concatenate([static.sh_coeffs(), dyn.sh_coeffs()])
    colors = sh_ops.eval_sh_color(sh_all, dirs, sh_degree)
    opac = jnp.concatenate([static.opacities(), dyn.opacities()])
    img, aux = render_binned(proj, colors, opac, cam, cfg)
    return img, aux


def moving_render(static, dyn, cams, cache, sh_degree, cfg=CFG):
    """B-batched moving render with shared dyn (B copies)."""
    B = cams.pose.t.shape[0]
    rep = lambda a: jnp.broadcast_to(a, (B,) + a.shape)
    caches = jax.tree.map(rep, cache)

    def cols_one(cam):
        dirs = view_directions(dyn.means, cam)
        return sh_ops.eval_sh_color(dyn.sh_coeffs(), dirs, sh_degree)

    d_cols = jax.vmap(cols_one)(cams)
    return render_moving_batch(
        caches, cams, rep(dyn.means), rep(dyn.quats), rep(dyn.log_scales),
        d_cols, rep(dyn.opacities()), cfg, sh_degree,
        dyn_capacity=128, dyn_max_tiles=9)


def batch_cams(*ts):
    return jax.vmap(lambda t: cam_at(t))(jnp.asarray(ts, jnp.float32))


@pytest.mark.parametrize("sh_degree", [0, 3])
@pytest.mark.parametrize("term_eps", [None, 1e-4])
def test_moving_matches_rebin(sh_degree, term_eps):
    """Same camera AND a small in-margin camera shift must both match the
    full rebin bit-closely (no truncation anywhere by construction)."""
    static, dyn, cam = setup(sh_degree=sh_degree)
    cfg = CFG._replace(term_eps=term_eps)
    cache = build(static, cam, cfg)
    assert int(cache.n_build_truncated) == 0

    shifted = [0.0, 0.0, -3.0], [0.03, -0.02, -3.01]
    cams = batch_cams(*shifted)
    for b in range(2):
        cb = cam_at(shifted[b])
        assert float(camera_budget_used(cache, cb)) <= 1.0

    imgs, aux = jax.jit(
        lambda cams: moving_render(static, dyn, cams, cache, sh_degree,
                                   cfg))(cams)
    assert int(aux.n_overflowed_tiles) == 0
    for b in range(2):
        ref, aux_ref = jax.jit(
            lambda: rebin_reference(static, dyn, cam_at(shifted[b]),
                                    sh_degree, cfg))()
        assert int(aux_ref.n_overflowed_tiles) == 0
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(imgs[b]), 0, -1), np.asarray(ref),
            atol=2e-5, rtol=1e-4)


def test_shift_bound_flags_large_motion():
    static, _, cam = setup(sh_degree=0)
    cache = build(static, cam)
    # millimeter-scale translation: well inside the budget
    assert float(camera_budget_used(cache, cam_at([0.002, 0, -3.0]))) < 0.5
    # a large jump must exceed the budget
    assert float(camera_budget_used(cache, cam_at([0.8, 0, -3.0]))) > 1.0
    # pure rotation consumes budget too
    q = jnp.asarray([np.cos(0.1), 0.0, np.sin(0.1), 0.0], jnp.float32)
    assert float(camera_budget_used(
        cache, cam_at([0.0, 0, -3.0], q=tuple(np.asarray(q))))) > 1.0


def test_shift_bound_is_conservative():
    """The budget fraction must dominate the BRUTE-FORCE per-gaussian
    footprint-edge shift over allowance for random small camera motions —
    this is the exactness guarantee the moving path rests on: while
    camera_budget_used ≤ 1, every counted gaussian moved less than its
    allowance, so the candidate lists are still supersets."""
    from sim_a_splat_tpu.ops.rasterize_moving import _depth_radius

    static, _, cam = setup(sh_degree=0)
    cache = build(static, cam)
    ts, tx, ty = 16, 3, 2
    W, H = 48, 32
    z0, r0, det0, u0, v0, _cn0 = _depth_radius(
        static.means, static.quats, static.log_scales, cam)
    rd = np.asarray(r0 + MARGIN)
    u0n, v0n = np.asarray(u0), np.asarray(v0)
    full_cover = ((u0n - rd <= ts) & (u0n + rd >= (tx - 1) * ts)
                  & (v0n - rd <= ts) & (v0n + rd >= (ty - 1) * ts))
    counted = np.asarray((z0 > 0.01) & (det0 > 0)) & ~full_cover
    assert counted.any()
    gap_x = np.maximum(np.maximum(-(u0n + rd), (u0n - rd) - W), 0.0)
    gap_y = np.maximum(np.maximum(-(v0n + rd), (v0n - rd) - H), 0.0)
    # the smooth bound covers edges up to the 1 px ceil quantization,
    # which _margin_stats budgets by shrinking the allowance
    allowance = (MARGIN - 1.0) + np.maximum(gap_x, gap_y)

    rng = np.random.default_rng(3)
    for _ in range(8):
        dt = rng.normal(0, 0.015, 3)
        ang = rng.normal(0, 0.01)
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * ax])
        cam2 = cam_at(np.asarray([0.0, 0.0, -3.0]) + dt, tuple(q))
        used = float(camera_budget_used(cache, cam2))
        z1, r1, det1, u1, v1, _cn1 = _depth_radius(
            static.means, static.quats, static.log_scales, cam2)
        dr = np.maximum(np.abs(np.asarray(r1 - r0)) - 1.0, 0.0)
        du = np.abs(np.asarray(u1 - u0)) + dr
        dv = np.abs(np.asarray(v1 - v0)) + dr
        frac = (np.maximum(du, dv) / allowance)[counted].max()
        assert float(frac) <= used + 1e-4, (float(frac), used)


def test_dilated_build_config_budgets():
    cfg = CFG._replace(buckets=((4, 0.9), (9, 0.1)))
    d = dilated_build_config(cfg, 16.0)
    # 2·16 px dilation at ts=16 adds ⌈32/16⌉+1 = 3 tiles per axis
    assert d.buckets == ((25, 0.9), (36, 0.1))
    assert d.max_tiles_per_gaussian == 36
    d0 = dilated_build_config(CFG, 8.0)        # no buckets: 3×3 → 5×5
    assert d0.max_tiles_per_gaussian == 25


def test_moving_gradients_match_rebin():
    """Scene-parameter gradients through build+reproject must match the
    rebin path's (the cache is built inside the differentiated region)."""
    sh_degree = 0
    static, dyn, cam0 = setup(sh_degree=sh_degree, n_static=120, n_dyn=25)
    cfg = CFG._replace(term_eps=1e-4)
    new_cam = cam_at([0.02, 0.01, -3.0])

    def loss_moving(sm, sc):
        st = static._replace(means=sm, sh_dc=sc)
        cache = build(st, cam0, cfg)
        cams = batch_cams([0.02, 0.01, -3.0])
        imgs, _ = moving_render(st, dyn, cams, cache, sh_degree, cfg)
        w = jnp.linspace(0.5, 1.5, imgs.shape[2])[None, None, :, None]
        return jnp.sum(w * imgs ** 2)

    def loss_rebin(sm, sc):
        st = static._replace(means=sm, sh_dc=sc)
        img, _ = rebin_reference(st, dyn, new_cam, sh_degree, cfg)
        w = jnp.linspace(0.5, 1.5, img.shape[0])[:, None, None]
        return jnp.sum(w * img ** 2)

    gm = jax.jit(jax.grad(loss_moving, argnums=(0, 1)))(
        static.means, static.sh_dc)
    gr = jax.jit(jax.grad(loss_rebin, argnums=(0, 1)))(
        static.means, static.sh_dc)
    for a, b in zip(gm, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3 * scale, rtol=2e-2)


def test_near_split_matches_rebin():
    """Camera INSIDE the scene volume: with the near/far split active the
    near-lens statics are re-binned per frame (exact), the margin budget
    stays finite, and the render still equals the full rebin."""
    static, dyn, _ = setup(sh_degree=1)
    cam = cam_at([0.0, 0.0, -0.9])     # nearest gaussians ~0.1 away
    cfg = CFG._replace(term_eps=1e-4)
    sh_flat = static.sh_coeffs().reshape(static.means.shape[0], -1)
    cache = build_moving_cache(
        static.means, static.quats, static.log_scales, sh_flat,
        static.opacities(), cam, dilated_build_config(cfg, MARGIN),
        kc=256, margin=MARGIN, z_split=0.5, t_max=0.05, near_cap=256)
    assert int(cache.n_near_over) == 0
    assert int(cache.n_build_truncated) == 0
    # the budget is finite and small for small motion (without the split
    # the near-lens content drives it to ~infinity)
    used = float(camera_budget_used(cache, cam_at([0.004, -0.003, -0.9])))
    assert used < 1.0, used

    cams = batch_cams([0.0, 0.0, -0.9], [0.004, -0.003, -0.9])
    imgs, aux = jax.jit(
        lambda cams: moving_render(static, dyn, cams, cache, 1, cfg))(cams)
    for b, t in enumerate([[0.0, 0.0, -0.9], [0.004, -0.003, -0.9]]):
        ref, aux_ref = jax.jit(
            lambda t=t: rebin_reference(static, dyn, cam_at(t), 1, cfg))()
        assert int(aux_ref.n_overflowed_tiles) == 0
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(imgs[b]), 0, -1), np.asarray(ref),
            atol=2e-5, rtol=1e-4)


def test_rotation_guards_behind_camera_entry():
    """A pure camera rotation can surface behind-camera content — the
    budget must flag it even with zero translation (review finding)."""
    static, _, cam = setup(sh_degree=0)
    # plant a gaussian just behind the near plane, off to the side
    st = static._replace(means=static.means.at[0].set(
        jnp.asarray([1.0, 0.0, -2.995])))    # camera at z=-3 ⇒ z_cam=0.005
    cache = build(st, cam)
    assert float(cache.near_gap) < 0.01
    # zero translation, finite rotation: must consume gap budget
    ang = 0.2
    q = (np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0)
    used = float(camera_budget_used(cache, cam_at([0.0, 0.0, -3.0], q=q)))
    assert used > 1.0, used


def test_empty_counted_set_keeps_guards():
    """With NO counted far candidates (tiny scene, everything near/full-
    cover) the budget must stay finite-and-sound, not NaN (review
    finding: inf/inf corr silently disabled every guard)."""
    static, _, _ = setup(sh_degree=0, n_static=5)
    cam = cam_at([0.0, 0.0, -0.05])          # lens inside the cloud
    sh_flat = static.sh_coeffs().reshape(static.means.shape[0], -1)
    cache = build_moving_cache(
        static.means, static.quats, static.log_scales, sh_flat,
        static.opacities(), cam, dilated_build_config(CFG, MARGIN),
        kc=128, margin=MARGIN, z_split=0.5, t_max=0.02, near_cap=8)
    used_small = float(camera_budget_used(cache, cam_at([0.0, 0, -0.051])))
    assert np.isfinite(used_small) or used_small == np.inf
    assert not np.isnan(used_small)
    # a retreat beyond every behind gaussian's gap must flag
    used_big = float(camera_budget_used(cache, cam_at([0.0, 0, -2.0])))
    assert not np.isnan(used_big)


def test_margin_must_exceed_one():
    static, _, cam = setup(sh_degree=0)
    sh_flat = static.sh_coeffs().reshape(static.means.shape[0], -1)
    with pytest.raises(ValueError, match="margin"):
        build_moving_cache(
            static.means, static.quats, static.log_scales, sh_flat,
            static.opacities(), cam, dilated_build_config(CFG, 0.5),
            kc=128, margin=0.5)


def test_near_pad_slots_never_bin():
    """Near-set PAD slots copy arbitrary gaussian geometry with opacity
    zeroed; they must not occupy per-tile capacity (review finding:
    phantoms could displace real dynamics under the nearest-K cut)."""
    static, dyn, _ = setup(sh_degree=1)
    cam = cam_at([0.0, 0.0, -0.9])
    cfg = CFG._replace(term_eps=1e-4)
    sh_flat = static.sh_coeffs().reshape(static.means.shape[0], -1)
    cache = build_moving_cache(
        static.means, static.quats, static.log_scales, sh_flat,
        static.opacities(), cam, dilated_build_config(cfg, MARGIN),
        kc=256, margin=MARGIN, z_split=0.5, t_max=0.05, near_cap=256)
    n_near = int((np.asarray(cache.near_op) > 0).sum())
    assert n_near < 256                       # pads exist
    cams = batch_cams([0.0, 0.0, -0.9])
    # tiny dyn_capacity: if pads were binned they would displace real
    # entries and the image would differ from the rebin reference
    B = 1
    rep = lambda a: jnp.broadcast_to(a, (B,) + a.shape)
    caches = jax.tree.map(rep, cache)
    from sim_a_splat_tpu.ops.projection import view_directions as vd
    d_cols = jax.vmap(lambda c: sh_ops.eval_sh_color(
        dyn.sh_coeffs(), vd(dyn.means, c), 1))(cams)
    imgs, aux = render_moving_batch(
        caches, cams, rep(dyn.means), rep(dyn.quats), rep(dyn.log_scales),
        d_cols, rep(dyn.opacities()), cfg, 1, dyn_capacity=128,
        dyn_max_tiles=9)
    ref, _ = jax.jit(lambda: rebin_reference(static, dyn, cam_at(
        [0.0, 0.0, -0.9]), 1, cfg))()
    np.testing.assert_allclose(np.moveaxis(np.asarray(imgs[0]), 0, -1),
                               np.asarray(ref), atol=2e-5, rtol=1e-4)
