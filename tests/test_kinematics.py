"""URDF chain FK/IK/PD: analytic planar checks + independent-numpy-FK
cross-check on the reference xarm6 URDF (skipped if not mounted)."""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.physics import kinematics as kin

PLANAR = Path(__file__).parent / "assets" / "planar2.urdf"
XARM6 = Path("/root/reference/robot_description/xarm_description/xarm6/urdf/"
             "xarm6_robot_white.urdf")


def test_parse_planar():
    c = kin.load_chain(PLANAR)
    assert c.link_names == ("base", "l1", "l2", "tool")
    assert c.ndof == 2
    assert c.actuated_joint_names() == ("j1", "j2")
    np.testing.assert_allclose(c.lower, [-3.14, -2.5])
    np.testing.assert_allclose(c.velocity_limit, [2.0, 2.0])
    assert c.visuals[1].mesh_path == "package://planar2/meshes/l1.stl"
    assert c.visuals[0] is None


def test_fk_planar_analytic():
    c = kin.load_chain(PLANAR)
    q = jnp.asarray([0.3, -0.7])
    poses = kin.fk(c, q)
    t1, t2 = 0.3, -0.7
    # tool at z=0.1, xy from the two-link trig formula (links 1.0 and 0.8)
    x = np.cos(t1) * 1.0 + np.cos(t1 + t2) * 0.8
    y = np.sin(t1) * 1.0 + np.sin(t1 + t2) * 0.8
    np.testing.assert_allclose(np.asarray(poses.t[3]), [x, y, 0.1], atol=1e-6)
    # base weld offsets everything
    base = SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.65, -1.23, 0.42]))
    poses_w = kin.fk(c, q, base)
    np.testing.assert_allclose(np.asarray(poses_w.t[3]),
                               [x + 0.65, y - 1.23, 0.1 + 0.42], atol=1e-6)


def _numpy_fk(chain, q):
    """Independent 4×4-matrix FK (no shared code with kin.fk)."""
    from scipy.spatial.transform import Rotation

    mats = [np.eye(4)]
    out = [np.eye(4)]
    for i in range(1, chain.num_links):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_quat(np.roll(chain.origin_q[i], -1)).as_matrix()
        T[:3, 3] = chain.origin_t[i]
        if chain.jtype[i] == kin.JOINT_REVOLUTE:
            J = np.eye(4)
            J[:3, :3] = Rotation.from_rotvec(
                chain.axis[i] * float(q[chain.qidx[i]])).as_matrix()
            T = T @ J
        elif chain.jtype[i] == kin.JOINT_PRISMATIC:
            T[:3, 3] += T[:3, :3] @ (chain.axis[i] * float(q[chain.qidx[i]]))
        out.append(out[chain.parent[i]] @ T)
    return out


@pytest.mark.skipif(not XARM6.exists(), reason="reference URDF not mounted")
def test_fk_xarm6_vs_numpy():
    c = kin.load_chain(XARM6)
    assert c.ndof == 6
    rng = np.random.default_rng(0)
    for _ in range(3):
        q = rng.uniform(np.maximum(c.lower, -np.pi),
                        np.minimum(c.upper, np.pi))
        poses = kin.fk(c, jnp.asarray(q, jnp.float32))
        expect = _numpy_fk(c, q)
        for i in range(c.num_links):
            np.testing.assert_allclose(np.asarray(poses.t[i]),
                                       expect[i][:3, 3], atol=1e-5)
            R = np.asarray(SE3(poses.q[i], poses.t[i]).rotation_matrix())
            np.testing.assert_allclose(R, expect[i][:3, :3], atol=1e-5)


def test_ik_reaches_reachable_pose():
    c = kin.load_chain(PLANAR)
    q_true = jnp.asarray([0.8, -0.4])
    target = kin.link_pose(c, q_true, "tool")
    res = kin.ik(c, "tool", target, q0=jnp.asarray([0.0, 0.1]),
                 ori_weight=0.2)
    assert bool(res.converged)
    check = kin.link_pose(c, res.q, "tool")
    np.testing.assert_allclose(np.asarray(check.t), np.asarray(target.t),
                               atol=5e-4)


def test_ik_unreachable_reports_failure():
    c = kin.load_chain(PLANAR)
    target = SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([5.0, 0.0, 0.1]))
    res = kin.ik(c, "tool", target, q0=jnp.zeros(2), ori_weight=0.2)
    assert not bool(res.converged)
    assert float(res.pos_err) > 1.0


@pytest.mark.skipif(not XARM6.exists(), reason="reference URDF not mounted")
def test_ik_xarm6_6dof():
    c = kin.load_chain(XARM6)
    eef = "link6"
    rng = np.random.default_rng(1)
    q_true = jnp.asarray(rng.uniform(-0.8, 0.8, c.ndof), jnp.float32)
    target = kin.link_pose(c, eef, None) if False else kin.link_pose(c, q_true, eef)
    res = jax.jit(lambda t, q0: kin.ik(c, eef, t, q0))(
        target, q_true + 0.2 * jnp.asarray(rng.normal(size=c.ndof), jnp.float32))
    assert bool(res.converged)
    assert float(res.pos_err) < 3e-4
    assert float(res.ori_err) < 0.01


def test_arm_pd_tracks_target():
    c = kin.load_chain(PLANAR)
    st = kin.arm_init(c, jnp.zeros(2))
    target = jnp.asarray([0.5, -0.8])
    step = jax.jit(lambda s: kin.arm_step(c, s, target))
    for _ in range(200):  # 2 s at kp=100/kd=20 ⇒ settled
        st = step(st)
    np.testing.assert_allclose(np.asarray(st.q), np.asarray(target), atol=1e-2)
    # velocity limit respected along the way
    st2 = kin.arm_init(c, jnp.zeros(2))
    vmaxseen = 0.0
    for _ in range(50):
        st2 = step(st2)
        vmaxseen = max(vmaxseen, float(jnp.abs(st2.qd).max()))
    assert vmaxseen <= 2.0 + 1e-5


def test_fk_vmap_and_grad():
    c = kin.load_chain(PLANAR)
    qs = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (8, 2)), jnp.float32)
    batched = jax.vmap(lambda q: kin.fk(c, q).t[3])(qs)
    assert batched.shape == (8, 3)

    g = jax.grad(lambda q: kin.fk(c, q).t[3][0])(qs[0])
    # analytic: d(x)/dθ1 = -sin(θ1)·1 - sin(θ1+θ2)·0.8
    t1, t2 = float(qs[0, 0]), float(qs[0, 1])
    np.testing.assert_allclose(float(g[0]),
                               -np.sin(t1) - np.sin(t1 + t2) * 0.8, atol=1e-5)
