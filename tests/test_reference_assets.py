"""Integration against the reference's REAL artifacts (/root/reference):
every URDF under robot_description parses; the divar + xarm6-1 mask/ICP
artifacts load with the SURVEY's exact counts and scales; the offline
match pipeline run end-to-end on a real robot (real STL meshes, synthetic
splat of the FK-posed robot) recovers the planted similarity.

Reference files: robot_description/xarm_description/xarm6/urdf/
xarm6_robot.urdf:1, assets/divar113vhw/masks/divar113vhw/
link_masks_global_dict.npy, match_splat.py:206-284."""

from pathlib import Path

import numpy as np
import pytest

from sim_a_splat_tpu.physics import kinematics as kin
from sim_a_splat_tpu.scenegraph import load_icp_sim3, load_link_masks

REF = Path("/root/reference")
needs_ref = pytest.mark.skipif(not REF.exists(),
                               reason="reference assets unavailable")


@needs_ref
def test_all_reference_urdfs_parse():
    """load_chain handles all 28 reference URDFs (urchin.URDF.load parity,
    splat_handler.py:156-163) — including mesh-dir duplicates and the
    single-link fragments under xarm6/urdf."""
    urdfs = sorted(REF.glob("robot_description/**/*.urdf"))
    assert len(urdfs) >= 28
    parsed = 0
    for u in urdfs:
        try:
            c = kin.load_chain(u)
        except ValueError as e:
            # multi-root fragment files are a legitimate parse refusal
            assert "root" in str(e)
            continue
        assert c.num_links >= 1
        parsed += 1
    assert parsed >= 25


@needs_ref
@pytest.mark.parametrize("rel,ndof", [
    ("robot_description/xarm_description/xarm6/urdf/xarm6_robot.urdf", 6),
    ("robot_description/divar113vhw/urdf/divar113vhw.urdf", 5),
    ("robot_description/scara/urdf/scara.urdf", 3),
])
def test_main_robots_dof_and_fk(rel, ndof):
    import jax.numpy as jnp

    c = kin.load_chain(REF / rel)
    assert c.ndof == ndof
    poses = kin.fk(c, jnp.zeros(ndof))
    assert np.isfinite(np.asarray(poses.t)).all()
    # visual meshes referenced with package:// URIs
    assert any(v is not None and v.mesh_path for v in c.visuals)


@needs_ref
def test_divar_masks_and_icp_exact():
    d = REF / "assets/divar113vhw/masks/divar113vhw"
    masks = load_link_masks(d / "link_masks_global_dict.npy")
    counts = {k: int(v.sum()) for k, v in masks.items()}
    assert counts == {"link0": 3342, "link1": 15563, "link2": 10528,
                      "link3": 7372, "link4": 7365, "link5": 6219}
    assert len(next(iter(masks.values()))) == 292247
    icp = load_icp_sim3(d / "icp_transformation.npy")
    np.testing.assert_allclose(float(icp.s), 1.04675, atol=1e-4)


@needs_ref
def test_xarm6_masks_and_icp_exact():
    d = REF / "assets/robots-scene-v2/masks/xarm6-1"
    masks = load_link_masks(d / "link_masks_global_dict.npy")
    counts = {k: int(v.sum()) for k, v in masks.items()}
    assert counts == {"link0": 534, "link1": 467, "link2": 1387,
                      "link3": 751, "link4": 424, "link5": 302, "link6": 89}
    assert len(next(iter(masks.values()))) == 113831
    icp = load_icp_sim3(d / "icp_transformation.npy")
    np.testing.assert_allclose(float(icp.s), 0.55251, atol=1e-4)


@needs_ref
def test_match_pipeline_on_real_scara(tmp_path):
    """End-to-end offline matcher on the real scara URDF + STL meshes:
    build a synthetic 'splat' by sampling the FK-posed robot surface,
    plant a known similarity, recover it with <1% scale error
    (match_splat.py:206-227 + the :288-303 validation block)."""
    import jax.numpy as jnp

    from sim_a_splat_tpu.ops import quaternion as quat
    from sim_a_splat_tpu.splat.scene import GaussianScene
    from sim_a_splat_tpu.tools import meshio
    from sim_a_splat_tpu.tools.match import load_link_meshes, match

    urdf = REF / "robot_description/scara/urdf/scara.urdf"
    chain = kin.load_chain(urdf)
    q_cfg = np.zeros(chain.ndof)
    meshes = load_link_meshes(chain, urdf.parent, q_cfg)
    assert meshes, "no visual meshes resolved from package:// URIs"

    combined = None
    for m in meshes.values():
        combined = m if combined is None else combined.concat(m)
    pts = meshio.sample_surface(combined, 6000, seed=1)

    # plant ground truth: scale 0.4, yaw 30°, offset
    s_true = 0.4
    ang = np.deg2rad(30.0)
    R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    t_true = np.array([0.3, -0.2, 0.1])
    splat_pts = (s_true * pts @ R_true.T + t_true).astype(np.float32)
    n = len(splat_pts)
    rng = np.random.default_rng(0)
    qr = rng.normal(size=(n, 4)); qr /= np.linalg.norm(qr, axis=1,
                                                       keepdims=True)
    scene = GaussianScene(
        means=jnp.asarray(splat_pts),
        quats=jnp.asarray(qr, jnp.float32),
        log_scales=jnp.full((n, 3), -5.0),
        logit_opacities=jnp.full((n,), 2.0),
        sh_dc=jnp.zeros((n, 3)),
    )

    init = np.eye(4)
    init[:3, :3] = 0.5 * R_true       # coarse manual guess, as the
    init[:3, 3] = t_true + 0.05       # reference's hand-entered init
    res = match(urdf, scene, q_cfg, tmp_path, trans_init=init,
                n_sample_points=4000, max_correspondence_distance=0.5,
                distance_threshold=0.02)
    assert abs(res.scale - s_true) / s_true < 0.01
    # same artifact filenames as the reference writes
    for f in ("icp_transformation.npy", "link_masks_global_dict.npy",
              "joint_config.npy"):
        assert (tmp_path / f).exists()
    # masks cover most of the synthetic robot cloud and use link names
    total = np.zeros(n, bool)
    for k, v in res.link_masks.items():
        total |= np.asarray(v, bool)
    assert total.mean() > 0.8
    # recovered transform validates through the strict Sim3 factorization
    icp = load_icp_sim3(tmp_path / "icp_transformation.npy")
    np.testing.assert_allclose(float(icp.s), s_true, rtol=0.01)
    R_rec = np.asarray(quat.to_rotation_matrix(icp.q))
    np.testing.assert_allclose(R_rec, R_true, atol=0.02)
