"""SSIM pinned against an independent numpy reference implementation.

The trainer's loss must match splatfacto's (1−λ)·L1 + λ·(1−SSIM) with the
standard torchmetrics SSIM (11×11 Gaussian window, σ=1.5, VALID padding,
K=(0.01, 0.03), data_range 1) — reference scene config
assets/divar113vhw/splatfacto/.../config.yml:207.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops.ssim import _gaussian_kernel, ssim, ssim_loss


def ssim_numpy(img, ref, size=11, sigma=1.5, data_range=1.0,
               k1=0.01, k2=0.03):
    """Independent direct-loop reference (valid-window gaussian SSIM)."""
    k = _gaussian_kernel(size, sigma).astype(np.float64)
    win = np.outer(k, k)
    H, W, C = img.shape
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    vals = []
    for c in range(C):
        x = img[..., c].astype(np.float64)
        y = ref[..., c].astype(np.float64)
        for i in range(H - size + 1):
            for j in range(W - size + 1):
                px = x[i:i + size, j:j + size]
                py = y[i:i + size, j:j + size]
                mx, my = (win * px).sum(), (win * py).sum()
                sx = (win * px * px).sum() - mx * mx
                sy = (win * py * py).sum() - my * my
                sxy = (win * px * py).sum() - mx * my
                vals.append(((2 * mx * my + c1) * (2 * sxy + c2))
                            / ((mx * mx + my * my + c1) * (sx + sy + c2)))
    return float(np.mean(vals))


def test_ssim_matches_numpy_reference():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 18, 3)).astype(np.float32)
    ref = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
        np.float32)
    got = float(jax.jit(ssim)(jnp.asarray(img), jnp.asarray(ref)))
    want = ssim_numpy(img, ref)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert 0.0 < got < 1.0


def test_ssim_identity_and_gradients():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (20, 20, 3)).astype(np.float32))
    np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-6)
    # loss decreases toward the target and is differentiable
    g = jax.grad(lambda x: ssim_loss(x, img))(img * 0.5 + 0.25)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_train_config_uses_ssim():
    from sim_a_splat_tpu.splat.train import TrainConfig, make_optimizer, \
        make_train_step
    from sim_a_splat_tpu.splat import synthetic_scene
    from sim_a_splat_tpu.ops import Camera, SE3
    from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig

    scene = synthetic_scene(60, seed=0, extent=0.5, sh_degree=0)
    cam = Camera.from_fov(SE3(jnp.asarray([1.0, 0, 0, 0]),
                              jnp.asarray([0.0, 0.0, -3.0])), 0.8, 32, 32)
    raster = RasterConfig(tile_capacity=128, max_tiles_per_gaussian=9,
                          chunk=64, sigma_cutoff=3.0)
    target = jnp.zeros((32, 32, 3), jnp.float32) + 0.3

    cfg_no = TrainConfig(iters=1, ssim_lambda=0.0)
    cfg_ss = TrainConfig(iters=1, ssim_lambda=0.2)
    losses = {}
    for name, cfg in (("no", cfg_no), ("ss", cfg_ss)):
        opt = make_optimizer(cfg, scene)
        step = make_train_step(cfg, raster, opt)
        _, _, loss, _ = step(scene, opt.init(scene), cam, target)
        losses[name] = float(loss)
        assert np.isfinite(losses[name])
    # the two configs compute genuinely different losses
    assert abs(losses["no"] - losses["ss"]) > 1e-6
