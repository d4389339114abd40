"""Native C++ geometry library (sim_a_splat_tpu.native) vs the numpy/scipy
golden models: KD-tree NN (ICP correspondences, reference Open3D N8) and
triangle BVH distance/occupancy (RaycastingScene, reference N9)."""

import numpy as np
import pytest

from sim_a_splat_tpu import native
from sim_a_splat_tpu.tools import masks
from sim_a_splat_tpu.tools.meshio import icosphere

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain on this host")


def test_kdtree_matches_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(4096, 3))
    q = np.concatenate([rng.normal(size=(1500, 3)), pts[:64]])  # incl. exact hits
    d, i = native.KDTree(pts).query(q)
    d_ref, i_ref = cKDTree(pts).query(q, k=1)
    np.testing.assert_array_equal(i, i_ref)
    np.testing.assert_allclose(d, d_ref, atol=1e-12)


def test_kdtree_shapes_and_errors():
    pts = np.zeros((10, 3))
    t = native.KDTree(pts)
    d, i = t.query(np.asarray([1.0, 0.0, 0.0]))
    assert d.shape == (1,) and i.shape == (1,)
    np.testing.assert_allclose(d[0], 1.0)
    with pytest.raises(ValueError):
        native.KDTree(np.zeros((10, 2)))


def test_bvh_distance_matches_numpy_exact():
    mesh = icosphere(2)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1.5, 1.5, (800, 3))
    d, tri = native.TriBVH(mesh.vertices, mesh.faces).distance(pts)
    d_ref = masks.distance_to_mesh(pts, mesh)
    np.testing.assert_allclose(d, d_ref, atol=1e-12)
    assert tri.min() >= 0 and tri.max() < mesh.num_faces


def test_bvh_occupancy_matches_numpy_parity():
    mesh = icosphere(2)
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1.3, 1.3, (1200, 3))
    occ = native.TriBVH(mesh.vertices, mesh.faces).occupancy(pts)
    occ_ref = masks.occupancy(pts, mesh)
    np.testing.assert_array_equal(occ, occ_ref)
    # sanity vs analytic sphere membership (icosphere(2) radius ≈ 1, the
    # faceted surface lies within ~2.5% of the unit sphere)
    r = np.linalg.norm(pts, axis=1)
    assert occ[r < 0.9].all()
    assert not occ[r > 1.01].any()


def test_bvh_used_by_link_mask():
    mesh = icosphere(1)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1.4, 1.4, (500, 3))
    m = masks.link_mask(pts, mesh, distance_threshold=0.05)
    # golden criterion computed with the numpy fallbacks
    m_ref = masks.occupancy(pts, mesh) | (
        masks.distance_to_mesh(pts, mesh) < 0.05)
    np.testing.assert_array_equal(m, m_ref)


def test_npz_writer_roundtrip(tmp_path):
    """Native multithreaded npz writer produces standard zip members that
    np.load reads back bit-exactly (incl. 0-d, empty, non-contiguous)."""
    rng = np.random.default_rng(5)
    arrays = {
        "obs.image": (rng.uniform(0, 1, (40, 24, 24, 3)) * 255).astype(
            np.uint8),
        "action": rng.normal(size=(40, 2)).astype(np.float32),
        "ints": np.arange(17, dtype=np.int64),
        "empty": np.zeros((0, 3), np.float32),
        "scalar": np.float64(3.5),
        "noncontig": np.arange(24).reshape(4, 6).T,
        "bools": np.asarray([True, False, True]),
    }
    p = tmp_path / "ep.npz"
    native.npz_write(p, arrays)
    z = np.load(p)
    assert set(z.files) == set(arrays)
    for k, v in arrays.items():
        v = np.asarray(v)
        assert z[k].dtype == v.dtype and z[k].shape == v.shape, k
        np.testing.assert_array_equal(z[k], v)

    # level=0 stores uncompressed, still a valid zip
    native.npz_write(p, arrays, level=0)
    z = np.load(p)
    np.testing.assert_array_equal(z["obs.image"], arrays["obs.image"])


def test_icp_with_native_correspondences():
    from sim_a_splat_tpu.tools.registration import icp

    rng = np.random.default_rng(4)
    tgt = rng.normal(size=(2000, 3))
    th = 0.15                                # small: ICP converges locally
    R = np.asarray([[np.cos(th), -np.sin(th), 0.0],
                    [np.sin(th), np.cos(th), 0.0], [0.0, 0.0, 1.0]])
    s, t = 1.1, np.asarray([0.05, -0.03, 0.08])
    src = (tgt - t) @ R / s                  # row-vector R⁻¹: tgt = sR·src+t
    res = icp(src, tgt, max_correspondence_distance=0.5,
              init=np.eye(4), with_scaling=True, max_iterations=60)
    got = src @ res.transformation[:3, :3].T + res.transformation[:3, 3]
    assert res.rmse < 1e-6
    np.testing.assert_allclose(got, tgt, atol=1e-5)
