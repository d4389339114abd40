"""In-framework gaussian-splat training loop.

The reference delegates splat training entirely to nerfstudio's splatfacto
(README.md:9: "trained using nerfstudio"; refinement invoked offline through
``ns_utils/nerfstudio_utils.py:179-341``).  This module closes that loop
inside the TPU framework: photometric training of a :class:`GaussianScene`
against posed RGB views with the framework's own differentiable tile
rasterizer, splatfacto's per-parameter-group learning rates, and periodic
densify/cull rounds built from ``splat/refine.py``.

Design notes (TPU-first):
- the jitted train step is pure ``(scene, opt_state, camera, image) →
  (scene, opt_state, loss, grad_stats)``; view selection, refinement, and
  logging live outside jit (refinement changes N ⇒ new compilation, exactly
  like splatfacto's periodic re-bucketing),
- densify decisions use the accumulated ∇‖means‖ statistics the optimizer
  loop already computes — the analogue of splatfacto's 2D-mean gradient
  accumulation (xys_grad_norm) without extra plumbing,
- all views must share one camera resolution so the step compiles once.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sim_a_splat_tpu.ops.projection import Camera
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig, rasterize_raw_sh
from sim_a_splat_tpu.splat import refine
from sim_a_splat_tpu.splat.scene import GaussianScene


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Splatfacto-default hyperparameters (splatfacto config fields in the
    reference's trained scene, assets/divar113vhw/.../config.yml:164-207)."""

    iters: int = 300
    # per-group LRs: splatfacto defaults (means decay exponentially)
    lr_means: float = 1.6e-4
    lr_means_final: float = 1.6e-6
    lr_sh_dc: float = 2.5e-3
    lr_sh_rest: float = 1.25e-4
    lr_opacities: float = 5e-2
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    # refinement (densify/cull) — splatfacto semantics, simplified schedule
    refine_every: int = 0               # 0 ⇒ no refinement rounds
    refine_start: int = 50
    densify_grad_thresh: float = 4e-4   # on accumulated ‖∇means‖
    densify_size_thresh: float = 0.01   # world units: split above, dup below
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    n_split_samples: int = 2
    l1_weight: float = 1.0              # L1 + (1-w)·L2 photometric mix
    # splatfacto loss: (1−λ)·photometric + λ·(1−SSIM), λ = ssim_lambda
    # (reference scene config assets/divar113vhw/.../config.yml:207)
    ssim_lambda: float = 0.2
    # splatfacto opacity-reset cadence: every `reset_alpha_every`
    # refinement rounds, cap opacities at 2·cull_alpha_thresh so
    # transparent gaussians re-earn their opacity (config.yml:174-191);
    # 0 ⇒ off
    reset_alpha_every: int = 0
    background: tuple = (0.0, 0.0, 0.0)


def make_optimizer(config: TrainConfig, scene: GaussianScene):
    """Per-parameter-group optax optimizer (splatfacto LR table)."""
    means_sched = optax.exponential_decay(
        config.lr_means, config.iters, config.lr_means_final / config.lr_means)
    txs = {
        "means": optax.adam(means_sched),
        "quats": optax.adam(config.lr_quats),
        "log_scales": optax.adam(config.lr_scales),
        "logit_opacities": optax.adam(config.lr_opacities),
        "sh_dc": optax.adam(config.lr_sh_dc),
        "sh_rest": optax.adam(config.lr_sh_rest),
    }
    labels = GaussianScene(
        means="means", quats="quats", log_scales="log_scales",
        logit_opacities="logit_opacities", sh_dc="sh_dc",
        sh_rest=None if scene.sh_rest is None else "sh_rest")
    return optax.multi_transform(txs, labels)


def make_train_step(config: TrainConfig, raster: RasterConfig,
                    optimizer) -> Callable:
    """Jitted ``(scene, opt_state, camera, image) → (scene, opt_state,
    loss, mean_grad_norm)``; ``mean_grad_norm`` is per-gaussian ‖∇means‖
    (the densify statistic)."""
    bg = jnp.asarray(config.background, jnp.float32)

    def loss_fn(scene: GaussianScene, camera: Camera, image: jnp.ndarray):
        img, _ = rasterize_raw_sh(
            scene.means, scene.quats, scene.log_scales, scene.sh_coeffs(),
            scene.opacities(), camera, scene.sh_degree, raster,
            background=bg)
        err = img - image
        photometric = (config.l1_weight * jnp.mean(jnp.abs(err))
                       + (1.0 - config.l1_weight) * jnp.mean(err ** 2))
        if config.ssim_lambda <= 0.0:
            return photometric
        from sim_a_splat_tpu.ops.ssim import ssim_loss
        return ((1.0 - config.ssim_lambda) * photometric
                + config.ssim_lambda * ssim_loss(img, image))

    @jax.jit
    def step(scene, opt_state, camera, image):
        loss, grads = jax.value_and_grad(loss_fn)(scene, camera, image)
        gnorm = jnp.linalg.norm(grads.means, axis=-1)
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss, gnorm

    return step


def refine_scene(scene: GaussianScene, grad_acc: np.ndarray,
                 config: TrainConfig) -> GaussianScene:
    """One splatfacto refinement round: split large high-grad gaussians,
    duplicate small high-grad ones, then cull transparent/oversized ones
    (reference path: ns_utils/nerfstudio_utils.py:196-258)."""
    scales = np.asarray(scene.scales()).max(-1)
    high = grad_acc > config.densify_grad_thresh
    split_mask = high & (scales > config.densify_size_thresh)
    dup_mask = high & ~split_mask
    if dup_mask.any():
        scene = refine.duplicate_gaussians(scene, dup_mask)
        split_mask = np.concatenate(
            [split_mask, np.zeros(int(dup_mask.sum()), bool)])
    if split_mask.any():
        scene = refine.split_gaussians(
            scene, split_mask, n_split_samples=config.n_split_samples)
    scene = refine.cull_gaussians(
        scene, config.cull_alpha_thresh, config.cull_scale_thresh)
    return scene


def train(
    scene: GaussianScene,
    cameras: Sequence[Camera],
    images: Sequence[np.ndarray],
    config: TrainConfig = TrainConfig(),
    raster: Optional[RasterConfig] = None,
    log_every: int = 0,
    log_fn: Callable = print,
    eval_every: int = 0,
    eval_fn: Optional[Callable] = None,
):
    """Train ``scene`` against posed views.  Returns (scene, history dict).

    Views are visited round-robin (splatfacto samples one camera per step).
    Refinement rounds re-jit (N changes) — keep ``refine_every`` coarse.
    ``eval_fn(scene, it)`` is called outside jit every ``eval_every`` iters
    (e.g. a PSNR probe for a training curve).
    """
    if raster is None:
        raster = RasterConfig(tile_capacity=256, max_tiles_per_gaussian=16,
                              chunk=64, sigma_cutoff=3.0)
    if len(cameras) != len(images) or not cameras:
        raise ValueError("need equally many cameras and images (≥1)")
    imgs = [jnp.asarray(im, jnp.float32) for im in images]

    optimizer = make_optimizer(config, scene)
    opt_state = optimizer.init(scene)
    step = make_train_step(config, raster, optimizer)

    history = {"loss": [], "n_gaussians": []}
    grad_acc = np.zeros(scene.num_gaussians, np.float32)
    n_acc = 0
    n_refines = 0
    for it in range(config.iters):
        v = it % len(cameras)
        scene, opt_state, loss, gnorm = step(scene, opt_state, cameras[v],
                                             imgs[v])
        grad_acc += np.asarray(gnorm)
        n_acc += 1
        history["loss"].append(float(loss))
        history["n_gaussians"].append(scene.num_gaussians)
        if log_every and (it + 1) % log_every == 0:
            log_fn(f"iter {it + 1}: loss {float(loss):.5f} "
                   f"N={scene.num_gaussians}")
        if eval_every and eval_fn is not None and (it + 1) % eval_every == 0:
            eval_fn(scene, it + 1)
        if (config.refine_every and it + 1 >= config.refine_start
                and (it + 1) % config.refine_every == 0
                and it + 1 < config.iters):
            scene = refine_scene(scene, grad_acc / max(n_acc, 1), config)
            n_refines += 1
            if (config.reset_alpha_every
                    and n_refines % config.reset_alpha_every == 0):
                # splatfacto opacity reset: cap at 2·cull_alpha_thresh
                # (logit space) so every gaussian re-earns its opacity
                cap = float(np.log(2 * config.cull_alpha_thresh
                                   / (1 - 2 * config.cull_alpha_thresh)))
                scene = scene._replace(logit_opacities=jnp.minimum(
                    scene.logit_opacities, cap))
            optimizer = make_optimizer(config, scene)
            opt_state = optimizer.init(scene)
            step = make_train_step(config, raster, optimizer)
            grad_acc = np.zeros(scene.num_gaussians, np.float32)
            n_acc = 0
    return scene, history


def psnr(img: np.ndarray, ref: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB over [0, 1] images."""
    mse = float(np.mean((np.asarray(img) - np.asarray(ref)) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def render_view(scene: GaussianScene, camera: Camera,
                raster: Optional[RasterConfig] = None,
                background=(0.0, 0.0, 0.0)) -> np.ndarray:
    if raster is None:
        raster = RasterConfig(tile_capacity=256, max_tiles_per_gaussian=16,
                              chunk=64, sigma_cutoff=3.0)
    img, _ = rasterize_raw_sh(
        scene.means, scene.quats, scene.log_scales, scene.sh_coeffs(),
        scene.opacities(), camera, scene.sh_degree, raster,
        background=jnp.asarray(background, jnp.float32))
    return np.asarray(img)
