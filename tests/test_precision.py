"""Numerical precision policy: pinned fp32-vs-bf16 error bounds.

SURVEY.md §7 requires "documented tolerances (fp32 vs bf16 policy per
kernel)"; PRECISION.md holds the policy table, these tests pin the measured
bounds so a dtype regression (or an over-eager cast) fails loudly.  Bounds
were measured on the unit-extent synthetic scene (see PRECISION.md for the
scene-scale caveat on ``means``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops import Camera, SE3
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig, rasterize_raw_sh
from sim_a_splat_tpu.splat import synthetic_scene

CFG = RasterConfig(tile_capacity=512, chunk=64, sigma_cutoff=3.0)


def setup(n=400, sh_degree=3):
    scene = synthetic_scene(n=n, seed=0, sh_degree=sh_degree, extent=0.8,
                            scale_range=(0.03, 0.1))
    pose = SE3(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0.0, -4.0]))
    cam = Camera.from_fov(pose, 0.8, 128, 128)
    return scene, cam


def render(scene, cam):
    img, _ = rasterize_raw_sh(scene.means, scene.quats, scene.log_scales,
                              scene.sh_coeffs(), scene.opacities(), cam,
                              scene.sh_degree, CFG)
    return img


def quantize_bf16(scene):
    return scene.__class__(*[
        None if f is None else f.astype(jnp.bfloat16).astype(jnp.float32)
        for f in scene])


def test_bf16_storage_image_bounds():
    """Full bf16 scene storage on a unit-extent scene: ≤0.03 max pixel
    error / ≥48 dB PSNR (measured 0.015 / 56 dB — bound at ~2×)."""
    scene, cam = setup()
    img32 = render(scene, cam)
    imgq = render(quantize_bf16(scene), cam)
    err = float(jnp.max(jnp.abs(imgq - img32)))
    mse = float(jnp.mean((imgq - img32) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert err < 0.03, f"bf16 storage max pixel error {err:.4f}"
    assert psnr > 48.0, f"bf16 storage PSNR {psnr:.1f} dB"


def test_bf16_color_opacity_fields_tight():
    """Colors/opacities are the bf16-safe fields (≤0.4% relative): per-field
    quantization must stay ≤4e-3 max pixel error (measured ≤1e-3)."""
    scene, cam = setup()
    img32 = render(scene, cam)
    for field in ("logit_opacities", "sh_dc", "sh_rest"):
        f = getattr(scene, field)
        sq = scene._replace(
            **{field: f.astype(jnp.bfloat16).astype(jnp.float32)})
        e = float(jnp.max(jnp.abs(render(sq, cam) - img32)))
        assert e < 4e-3, f"bf16 {field}: max pixel error {e:.5f}"


@pytest.mark.slow
def test_bf16_storage_gradient_direction():
    """Gradients at bf16-quantized parameters must stay directionally
    faithful: cosine ≥ 0.999 per field (measured ≥ 0.9997)."""
    scene, cam = setup(n=200)

    def loss(s):
        return jnp.mean(render(s, cam) ** 2)

    g32 = jax.grad(loss)(scene)
    gq = jax.grad(loss)(quantize_bf16(scene))
    for name, a, b in zip(scene._fields, g32, gq):
        if a is None:
            continue
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        assert cos > 0.999, f"grad cosine[{name}] = {cos:.5f}"


def test_payload_xy_needs_fp32():
    """Negative control for the policy: quantizing screen-space positions
    to bf16 at a 512-unit workspace scale produces ≥0.5-unit coordinate
    error (bf16 ulp at 512 = 2.0) — exactly why tile-list payloads keep
    xy/conic in fp32 (PRECISION.md table)."""
    x = np.linspace(0, 512, 4097, dtype=np.float32)
    xq = x.astype(jnp.bfloat16).astype(np.float32)
    assert np.max(np.abs(xq - x)) >= 0.5
