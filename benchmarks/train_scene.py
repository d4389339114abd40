"""Non-toy splat training run: ≥10k gaussians, 128², ≥8 views, with
refinement rounds — the round-4 evidence that the framework's gradients
optimize a real reconstruction, not just decrease a bench loss
(VERDICT r3 next #7; the reference delegates this training to nerfstudio
splatfacto, README.md:9, ns_utils/nerfstudio_utils.py:179-341).

Protocol: a ground-truth synthetic scene (TRAIN_N gaussians) is rendered
from TRAIN_VIEWS cameras on a circle; a degraded init (subsampled means +
position jitter, grey colors, inflated scales) is trained with the
in-framework trainer (splatfacto LR groups + densify/cull) and PSNR is
evaluated over all views every eval interval.  Writes the curve to
TRAIN_r05.json at the repo root and a final side-by-side PPM
(TRAIN_OUT overrides; TRAIN_SSIM=0 reproduces the r4 L1-only loss).

Usage: python benchmarks/train_scene.py      (env: TRAIN_N, TRAIN_ITERS,
TRAIN_VIEWS, TRAIN_RES, TRAIN_CPU=1 to force host CPU)
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def ring_cameras(n_views, radius, height, res, fov=0.9):
    """Cameras on a circle, all looking at the origin (OpenCV +z forward)."""
    import jax.numpy as jnp
    from sim_a_splat_tpu.ops import Camera, SE3
    from sim_a_splat_tpu.ops import quaternion as quat

    cams = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        pos = np.asarray([radius * np.cos(ang), radius * np.sin(ang), height],
                         np.float32)
        # look-at: +z toward origin, up = world -y-ish
        z = -pos / np.linalg.norm(pos)
        up = np.asarray([0.0, 0.0, -1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x) + 1e-12
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1)          # columns = camera axes
        # rotation matrix → wxyz quaternion (Shepperd)
        w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
        qx = (R[2, 1] - R[1, 2]) / (4 * w + 1e-12)
        qy = (R[0, 2] - R[2, 0]) / (4 * w + 1e-12)
        qz = (R[1, 0] - R[0, 1]) / (4 * w + 1e-12)
        q = np.asarray([w, qx, qy, qz], np.float32)
        q /= np.linalg.norm(q)
        cams.append(Camera.from_fov(
            SE3(jnp.asarray(q), jnp.asarray(pos)), fov, res, res))
    return cams


def main():
    force_cpu = os.environ.get("TRAIN_CPU", "0") != "0"
    import jax
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(Path(__file__).resolve().parent.parent / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax.numpy as jnp

    from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
    from sim_a_splat_tpu.splat import synthetic_scene
    from sim_a_splat_tpu.splat.scene import GaussianScene
    from sim_a_splat_tpu.splat.train import (
        TrainConfig, psnr, render_view, train,
    )

    N = int(os.environ.get("TRAIN_N", "12000"))
    ITERS = int(os.environ.get("TRAIN_ITERS", "2000"))
    VIEWS = int(os.environ.get("TRAIN_VIEWS", "8"))
    RES = int(os.environ.get("TRAIN_RES", "128"))
    seed = int(os.environ.get("TRAIN_SEED", "0"))
    lr_scale = float(os.environ.get("TRAIN_LR_SCALE", "6.0"))

    dev = jax.devices()[0]
    log(f"train_scene: device={dev.platform}/{dev.device_kind} N={N} "
        f"iters={ITERS} views={VIEWS} res={RES}")

    raster = RasterConfig(tile_capacity=512, max_tiles_per_gaussian=16,
                          chunk=128, sigma_cutoff=3.0,
                          backend=("xla" if force_cpu else "pallas"),
                          term_eps=1e-4)

    # ground truth: a dense colorful scene, sh_degree 1 (view-dependence
    # present but learnable from 8 views)
    gt = synthetic_scene(N, seed=seed, extent=0.9, scale_range=(0.02, 0.06),
                         sh_degree=1)
    cams = ring_cameras(VIEWS, radius=3.2, height=-1.2, res=RES)
    t0 = time.time()
    gt_views = [render_view(gt, c, raster) for c in cams]
    log(f"GT renders in {time.time() - t0:.1f}s; "
        f"view0 mean={gt_views[0].mean():.3f}")

    # degraded init: half the gaussians, jittered positions, grey, inflated
    rng = np.random.default_rng(seed + 1)
    keep = rng.choice(N, size=N // 2, replace=False)
    init = GaussianScene(
        means=jnp.asarray(np.asarray(gt.means)[keep]
                          + rng.normal(0, 0.03, (N // 2, 3)), jnp.float32),
        quats=jnp.asarray(np.tile([1.0, 0, 0, 0], (N // 2, 1)), jnp.float32),
        log_scales=jnp.asarray(
            np.full((N // 2, 3), np.log(0.05)), jnp.float32),
        logit_opacities=jnp.asarray(np.full(N // 2, 0.0), jnp.float32),
        sh_dc=jnp.asarray(np.zeros((N // 2, 3)), jnp.float32),
        sh_rest=jnp.asarray(np.zeros((N // 2, 3, 3)), jnp.float32),
    )
    init = jax.device_put(init)

    cfg = TrainConfig(
        iters=ITERS,
        # splatfacto LRs are tuned for 30k iters; scale up for a 2k run
        lr_means=1.6e-4 * lr_scale, lr_means_final=1.6e-6 * lr_scale,
        lr_sh_dc=2.5e-3 * lr_scale, lr_sh_rest=1.25e-4 * lr_scale,
        lr_opacities=5e-2, lr_scales=5e-3 * lr_scale, lr_quats=1e-3 * lr_scale,
        refine_every=ITERS // 5, refine_start=ITERS // 5,
        densify_grad_thresh=2e-4, densify_size_thresh=0.04,
        cull_alpha_thresh=0.08, cull_scale_thresh=1.0,
        # splatfacto loss: (1−λ)·L1 + λ·(1−SSIM), λ=0.2 (divar
        # config.yml:207) — round-5 default; λ=0 reproduces the r4 run
        ssim_lambda=float(os.environ.get("TRAIN_SSIM", "0.2")),
        reset_alpha_every=int(os.environ.get("TRAIN_RESET_ALPHA", "0")),
    )

    curve = []

    def eval_psnr(scene, it):
        vals = [psnr(render_view(scene, c, raster), v)
                for c, v in zip(cams, gt_views)]
        m = float(np.mean(vals))
        curve.append(dict(iter=it, psnr_mean=round(m, 3),
                          psnr_min=round(float(np.min(vals)), 3),
                          n_gaussians=scene.num_gaussians))
        log(f"eval @ {it}: PSNR mean {m:.2f} dB min {np.min(vals):.2f} "
            f"N={scene.num_gaussians}")
        return m

    eval_psnr(init, 0)
    t0 = time.time()
    scene, history_all = train(
        init, cams, gt_views, cfg, raster,
        log_every=max(ITERS // 20, 1), log_fn=log,
        eval_every=max(ITERS // 8, 1), eval_fn=eval_psnr)
    wall = time.time() - t0
    final = eval_psnr(scene, ITERS)

    out = {
        "protocol": dict(N_gt=N, init_n=N // 2, iters=ITERS, views=VIEWS,
                         res=RES, lr_scale=lr_scale,
                         refine_every=cfg.refine_every,
                         ssim_lambda=cfg.ssim_lambda,
                         reset_alpha_every=cfg.reset_alpha_every,
                         device=f"{dev.platform}/{dev.device_kind}"),
        "wall_s": round(wall, 1),
        "final_psnr_mean_db": round(final, 3),
        "n_final": scene.num_gaussians,
        "curve": curve,
        "loss_every_100": [round(float(x), 5)
                           for x in history_all["loss"][::100]],
        "n_history_every_100": history_all["n_gaussians"][::100],
    }
    path = Path(__file__).resolve().parent.parent / os.environ.get(
        "TRAIN_OUT", "TRAIN_r05.json")
    path.write_text(json.dumps(out, indent=1))
    log(f"wrote {path} (final {final:.2f} dB, {wall:.0f}s)")

    # side-by-side of view 0 for eyeballing
    import struct
    img = np.clip(np.concatenate(
        [gt_views[0], render_view(scene, cams[0], raster)], axis=1), 0, 1)
    arr = (img * 255).astype(np.uint8)
    with open("/tmp/train_sbs.ppm", "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.tobytes())
    print(json.dumps({"final_psnr_mean_db": out["final_psnr_mean_db"],
                      "n_final": out["n_final"], "wall_s": out["wall_s"]}))


if __name__ == "__main__":
    main()
