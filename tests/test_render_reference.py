"""Golden-renderer tests: independent numpy implementation with *sequential*
front-to-back compositing vs the vectorized cumprod form, plus analytic cases."""

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.ops.projection import Camera, project, BLUR_2D
from sim_a_splat_tpu.ops.rasterize_reference import (
    render_reference, render_reference_sh, ALPHA_MIN, ALPHA_CLAMP,
)
from sim_a_splat_tpu.splat import synthetic_scene
import pytest


def make_camera(width=32, height=24, fov=0.8, z=-3.0):
    """Camera at (0,0,z) looking down +z (OpenCV convention)."""
    pose = SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, z]))
    return Camera.from_fov(pose, fov, width, height)


def numpy_render(means, covs, colors, opacities, cam):
    """Straight-line numpy renderer with an explicit per-pixel loop over
    depth-sorted gaussians — structurally different from the jnp version."""
    H, W = cam.height, cam.width
    fx, fy, cx, cy = float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)
    from scipy.spatial.transform import Rotation

    qwxyz = np.asarray(cam.pose.q)
    Rc2w = Rotation.from_quat(np.roll(qwxyz, -1)).as_matrix()
    tc2w = np.asarray(cam.pose.t)
    Rw2c, tw2c = Rc2w.T, -Rc2w.T @ tc2w

    n = means.shape[0]
    rows = []
    for i in range(n):
        p = Rw2c @ means[i] + tw2c
        if p[2] <= 0.01:
            continue
        z = p[2]
        u, v = fx * p[0] / z + cx, fy * p[1] / z + cy
        cov_cam = Rw2c @ covs[i] @ Rw2c.T
        J = np.array([[fx / z, 0, -fx * p[0] / z**2], [0, fy / z, -fy * p[1] / z**2]])
        cov2 = J @ cov_cam @ J.T + BLUR_2D * np.eye(2)
        det = np.linalg.det(cov2)
        if det <= 0:
            continue
        conic = np.linalg.inv(cov2)
        mid = 0.5 * (cov2[0, 0] + cov2[1, 1])
        lam = mid + np.sqrt(max(mid * mid - det, 0.01))
        radius = np.ceil(3.0 * np.sqrt(lam))
        if u + radius <= 0 or u - radius >= W or v + radius <= 0 or v - radius >= H:
            continue
        rows.append((z, u, v, conic, colors[i], opacities[i]))
    rows.sort(key=lambda r: r[0])

    img = np.zeros((H, W, 3))
    for yy in range(H):
        for xx in range(W):
            px, py = xx + 0.5, yy + 0.5
            T = 1.0
            acc = np.zeros(3)
            for z, u, v, conic, col, op in rows:
                d = np.array([px - u, py - v])
                power = -0.5 * d @ conic @ d
                alpha = min(op * np.exp(min(power, 0.0)), ALPHA_CLAMP)
                if alpha < ALPHA_MIN:
                    continue
                acc += T * alpha * np.clip(col, 0, None)
                T *= 1.0 - alpha
            img[yy, xx] = acc
    return img


@pytest.mark.slow
def test_matches_independent_numpy_renderer():
    scene = synthetic_scene(40, seed=0, extent=0.8, scale_range=(0.05, 0.2))
    cam = make_camera()
    covs = scene.covs()
    colors = scene.colors_dc()
    opac = scene.opacities()
    img = np.asarray(render_reference(scene.means, covs, colors, opac, cam))
    expect = numpy_render(
        np.asarray(scene.means, np.float64),
        np.asarray(covs, np.float64),
        np.asarray(colors, np.float64),
        np.asarray(opac, np.float64),
        cam,
    )
    np.testing.assert_allclose(img, expect, atol=2e-3)


def test_single_gaussian_center_peak():
    # one isotropic gaussian dead center: alpha peaks at image center
    means = jnp.asarray([[0.0, 0.0, 0.0]])
    covs = jnp.eye(3)[None] * 0.05**2
    colors = jnp.asarray([[1.0, 0.0, 0.0]])
    opac = jnp.asarray([0.9])
    cam = make_camera(width=33, height=33, z=-2.0)
    img, depth, alpha = render_reference(
        means, covs, colors, opac, cam, return_depth=True
    )
    alpha = np.asarray(alpha)
    cy, cx = np.unravel_index(np.argmax(alpha), alpha.shape)
    assert abs(cy - 16) <= 1 and abs(cx - 16) <= 1
    # depth of the only contributor = distance along z
    assert abs(float(depth[cy, cx]) - 2.0) < 1e-3
    # red channel dominates
    assert float(img[16, 16, 0]) > 0.5 * float(alpha[16, 16])


def test_background_composited():
    cam = make_camera(width=8, height=8)
    means = jnp.asarray([[100.0, 100.0, 100.0]])  # off-screen
    covs = jnp.eye(3)[None] * 1e-4
    img = render_reference(
        means, covs, jnp.ones((1, 3)), jnp.asarray([1.0]), cam,
        background=jnp.asarray([0.2, 0.4, 0.6]),
    )
    np.testing.assert_allclose(
        np.asarray(img), np.tile([0.2, 0.4, 0.6], (8, 8, 1)), atol=1e-6
    )


def test_occlusion_ordering():
    # near opaque red in front of far green: center pixel ≈ red
    means = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    covs = jnp.tile(jnp.eye(3) * 0.3**2, (2, 1, 1))
    colors = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    opac = jnp.asarray([0.99, 0.99])
    cam = make_camera(width=17, height=17, z=-2.0)
    img = np.asarray(render_reference(means, covs, colors, opac, cam))
    assert img[8, 8, 0] > 0.9
    assert img[8, 8, 1] < 0.1


@pytest.mark.slow
def test_differentiable():
    scene = synthetic_scene(12, seed=1, extent=0.5, scale_range=(0.05, 0.15))
    cam = make_camera(width=16, height=16)

    def loss(means, log_scales):
        from sim_a_splat_tpu.ops.covariance import compute_cov

        covs = compute_cov(scene.quats, jnp.exp(log_scales))
        img = render_reference(means, covs, scene.colors_dc(), scene.opacities(), cam)
        return jnp.sum(img**2)

    g_means, g_ls = jax.grad(loss, argnums=(0, 1))(scene.means, scene.log_scales)
    assert np.isfinite(np.asarray(g_means)).all()
    assert np.isfinite(np.asarray(g_ls)).all()
    assert float(jnp.abs(g_means).max()) > 0


@pytest.mark.slow
def test_gradcheck_vs_finite_differences():
    from jax.test_util import check_grads

    scene = synthetic_scene(6, seed=2, extent=0.4, scale_range=(0.1, 0.2))
    cam = make_camera(width=12, height=12)
    covs0 = scene.covs()

    def f(means):
        img = render_reference(means, covs0, scene.colors_dc(), scene.opacities(), cam)
        return jnp.sum(jnp.sin(3.0 * img))

    # fp32 finite differences are noisy near the hard ALPHA_MIN cutoff; this
    # guards the autodiff structure, not 1e-6 agreement.
    check_grads(f, (scene.means,), order=1, modes=["rev"], atol=6e-2, rtol=6e-2)


def test_sh_render_view_dependence():
    scene = synthetic_scene(10, seed=3, extent=0.4, sh_degree=3,
                            scale_range=(0.08, 0.2))
    cam1 = make_camera(z=-2.0)
    img1 = np.asarray(render_reference_sh(
        scene.means, scene.covs(), scene.sh_coeffs(), scene.opacities(), cam1, 3))
    # same camera distance, opposite side
    pose2 = SE3(jnp.asarray([0.0, 0.0, 1.0, 0.0]), jnp.asarray([0.0, 0.0, 2.0]))
    cam2 = Camera.from_fov(pose2, 0.8, cam1.width, cam1.height)
    img2 = np.asarray(render_reference_sh(
        scene.means, scene.covs(), scene.sh_coeffs(), scene.opacities(), cam2, 3))
    assert not np.allclose(img1, img2, atol=1e-3)
    assert np.isfinite(img1).all() and np.isfinite(img2).all()


def test_projection_culling():
    cam = make_camera()
    # behind camera
    proj = project(jnp.asarray([[0.0, 0.0, -10.0]]), jnp.eye(3)[None] * 1e-4, cam)
    assert not bool(proj.valid[0])
    # in frustum
    proj = project(jnp.asarray([[0.0, 0.0, 0.0]]), jnp.eye(3)[None] * 1e-4, cam)
    assert bool(proj.valid[0])
