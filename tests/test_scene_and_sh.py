import json

import numpy as np
import jax.numpy as jnp

from sim_a_splat_tpu.ops import sh as sh_ops
from sim_a_splat_tpu.ops import covariance
from sim_a_splat_tpu.splat import (
    GaussianScene, synthetic_scene, load_json, load_npz, save_npz, load_ply,
    aabb_mask,
)


def test_sh2rgb_matches_reference_constant():
    # reference: SH2RGB(sh) = sh*C0 + 0.5, C0 = 0.28209479177387814
    sh = jnp.asarray([[0.0, 1.0, -1.0]])
    rgb = np.asarray(sh_ops.sh_to_rgb(sh))
    np.testing.assert_allclose(
        rgb, [[0.5, 0.78209479, 0.21790521]], atol=1e-7
    )
    back = np.asarray(sh_ops.rgb_to_sh(jnp.asarray(rgb)))
    np.testing.assert_allclose(back, np.asarray(sh), atol=1e-6)


def test_eval_sh_degree0_equals_dc():
    scene = synthetic_scene(16, sh_degree=0)
    dirs = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh_ops.eval_sh(scene.sh_coeffs(), dirs, 0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(scene.sh_dc) * sh_ops.C0, atol=1e-6
    )


def test_eval_sh_constancy_over_directions_deg0():
    sh = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3)), jnp.float32)[None]
    d1 = jnp.asarray([[1.0, 0.0, 0.0]])
    d2 = jnp.asarray([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(sh_ops.eval_sh(sh, d1, 0)), np.asarray(sh_ops.eval_sh(sh, d2, 0))
    )


def test_eval_sh_degree3_orthogonality_sanity():
    # band-1 terms flip sign when the direction flips
    rng = np.random.default_rng(2)
    sh = np.zeros((1, 16, 3), np.float32)
    sh[:, 1:4] = rng.normal(size=(1, 3, 3))
    d = rng.normal(size=(1, 3)).astype(np.float32)
    d /= np.linalg.norm(d)
    f = sh_ops.eval_sh(jnp.asarray(sh), jnp.asarray(d), 3)
    g = sh_ops.eval_sh(jnp.asarray(sh), jnp.asarray(-d), 3)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), atol=1e-6)


def test_compute_cov_matches_definition():
    scene = synthetic_scene(32, seed=4)
    covs = np.asarray(scene.covs())
    # manual: R S S^T R^T
    from scipy.spatial.transform import Rotation

    q = np.asarray(scene.quats)
    R = Rotation.from_quat(np.roll(q, -1, axis=-1)).as_matrix()
    S = np.exp(np.asarray(scene.log_scales))
    expect = np.einsum("nij,nj,nkj->nik", R, S * S, R)
    np.testing.assert_allclose(covs, expect, atol=1e-5)
    # inverse covariance really is the inverse
    covs_inv = np.asarray(scene.covs_inv())
    prod = np.einsum("nij,njk->nik", covs, covs_inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(3), (32, 1, 1)), atol=1e-3)


def test_activations_match_reference_semantics():
    scene = synthetic_scene(8, seed=5)
    np.testing.assert_allclose(
        np.asarray(scene.scales()), np.exp(np.asarray(scene.log_scales)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(scene.opacities()),
        1.0 / (1.0 + np.exp(-np.asarray(scene.logit_opacities))),
        atol=1e-6,
    )


def test_json_roundtrip(tmp_path):
    scene = synthetic_scene(10, seed=6)
    blob = {
        "means": np.asarray(scene.means).tolist(),
        "rotations": np.asarray(scene.quats).tolist(),
        "scalings": np.asarray(scene.log_scales).tolist(),
        "opacities": np.asarray(scene.logit_opacities).tolist(),
        "colors": np.asarray(scene.sh_dc).tolist(),
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(blob))
    loaded = load_json(p)
    np.testing.assert_allclose(np.asarray(loaded.means), np.asarray(scene.means), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.sh_dc), np.asarray(scene.sh_dc), atol=1e-6)


def test_npz_roundtrip(tmp_path):
    scene = synthetic_scene(12, seed=7, sh_degree=3)
    p = tmp_path / "scene.npz"
    save_npz(p, scene)
    loaded = load_npz(p)
    for a, b in zip(scene, loaded):
        if a is None:
            assert b is None
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert loaded.sh_degree == 3


def test_ply_roundtrip(tmp_path):
    scene = synthetic_scene(9, seed=8, sh_degree=1)
    n = scene.num_gaussians
    k_rest = 3
    props = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(3 * k_rest)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    rest_cm = np.asarray(scene.sh_rest).transpose(0, 2, 1).reshape(n, -1)  # channel-major
    table = np.concatenate(
        [
            np.asarray(scene.means),
            np.zeros((n, 3), np.float32),
            np.asarray(scene.sh_dc),
            rest_cm,
            np.asarray(scene.logit_opacities)[:, None],
            np.asarray(scene.log_scales),
            np.asarray(scene.quats),
        ],
        axis=1,
    ).astype("<f4")
    p = tmp_path / "scene.ply"
    with open(p, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        hdr += [f"property float {q}" for q in props]
        hdr += ["end_header"]
        f.write(("\n".join(hdr) + "\n").encode("ascii"))
        f.write(table.tobytes())
    loaded = load_ply(p)
    np.testing.assert_allclose(np.asarray(loaded.means), np.asarray(scene.means), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.sh_rest), np.asarray(scene.sh_rest), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.quats), np.asarray(scene.quats), atol=1e-6)


def test_aabb_mask():
    scene = synthetic_scene(100, seed=9, extent=1.0)
    bounds = np.array([[-0.5, 0.5]] * 3)
    mask = np.asarray(aabb_mask(scene, bounds))
    means = np.asarray(scene.means)
    expect = np.all((means >= -0.5) & (means <= 0.5), axis=-1)
    np.testing.assert_array_equal(mask, expect)


def test_scene_select_and_sh_degree():
    scene = synthetic_scene(20, seed=10, sh_degree=2)
    assert scene.sh_degree == 2
    sub = scene.select(jnp.asarray([0, 3, 5]))
    assert sub.num_gaussians == 3
    assert sub.sh_rest.shape == (3, 8, 3)


def test_eval_sh_color_split_matches_concat():
    # the split evaluator (no (N, K, 3) concat temp) must equal the stacked
    # one for every degree
    rng = np.random.default_rng(3)
    n = 64
    sh_dc = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    sh_rest = jnp.asarray(rng.normal(0, 0.2, (n, 15, 3)), jnp.float32)
    dirs = rng.normal(size=(n, 3))
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True),
                       jnp.float32)
    for deg in (0, 1, 2, 3):
        stacked = jnp.concatenate([sh_dc[:, None, :], sh_rest], axis=1)
        a = sh_ops.eval_sh_color(stacked, dirs, deg)
        b = sh_ops.eval_sh_color_split(sh_dc, sh_rest if deg else None,
                                       dirs, deg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_select_contiguous_slice_equals_gather():
    # the slice fast path in GaussianScene.select must match the gather
    from sim_a_splat_tpu.splat import synthetic_scene

    scene = synthetic_scene(50, seed=0, sh_degree=2)
    idx_slice = jnp.arange(10, 37, dtype=jnp.int32)       # contiguous
    idx_gather = jnp.asarray(np.r_[10:20, 25:37], jnp.int32)  # not
    a = scene.select(idx_slice)
    b = GaussianScene(*[None if x is None else x[idx_slice] for x in scene])
    for x, y in zip(a, b):
        if x is None:
            continue
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    c = scene.select(idx_gather)
    assert c.means.shape[0] == idx_gather.shape[0]
    # negative contiguous runs must fall through to the gather path
    # (lax.slice would wrap the start and raise; ADVICE r3)
    idx_neg = jnp.asarray([-3, -2, -1], jnp.int32)
    d = scene.select(idx_neg)
    np.testing.assert_array_equal(np.asarray(d.means),
                                  np.asarray(scene.means[-3:]))
