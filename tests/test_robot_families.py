"""Robot-family parity: the scara (3-dof, prismatic quill) and 5-dof arm
URDFs standing in for the reference's robot_description/{scara,
divar113vhw} families, through FK, IK, and the full manipulator env.

The reference leaves "TODO: Scara IK fails" (tests/test_eef_wrapper.py:31);
the DLS IK here solves the scara's position-only problem (yaw-free target)
directly."""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.envs import ManipulatorSimEnv
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.physics import kinematics as kin

REPO = Path(__file__).resolve().parent.parent
SCARA = REPO / "robot_description/pushscara3/urdf/pushscara3.urdf"
ARM5 = REPO / "robot_description/pusharm5/urdf/pusharm5.urdf"


def test_scara_fk_prismatic():
    c = kin.load_chain(SCARA)
    assert c.ndof == 3
    # zero config: tool at x = 0.25 + 0.20, z = 0.30 - 0.06
    p0 = kin.link_pose(c, jnp.zeros(3), "push_tool")
    np.testing.assert_allclose(np.asarray(p0.t), [0.45, 0.0, 0.24],
                               atol=1e-6)
    # quill extension moves the tool straight down (axis -z)
    p1 = kin.link_pose(c, jnp.asarray([0.0, 0.0, 0.1]), "push_tool")
    np.testing.assert_allclose(np.asarray(p1.t), [0.45, 0.0, 0.14],
                               atol=1e-6)
    # shoulder yaw sweeps the tool in the xy plane at constant radius
    p2 = kin.link_pose(c, jnp.asarray([np.pi / 2, 0.0, 0.0]), "push_tool")
    np.testing.assert_allclose(np.asarray(p2.t), [0.0, 0.45, 0.24],
                               atol=1e-6)


def test_scara_ik_position():
    """Position-only IK on the scara (the reference's open TODO)."""
    c = kin.load_chain(SCARA)
    q_true = jnp.asarray([0.7, -1.1, 0.12])
    target = kin.link_pose(c, q_true, "push_tool")
    res = kin.ik(c, "push_tool", target, q0=jnp.asarray([0.0, -0.5, 0.0]),
                 ori_weight=0.0)
    check = kin.link_pose(c, res.q, "push_tool")
    assert float(res.pos_err) < 1e-4
    np.testing.assert_allclose(np.asarray(check.t), np.asarray(target.t),
                               atol=5e-4)


def test_arm5_fk_and_ik():
    c = kin.load_chain(ARM5)
    assert c.ndof == 5
    rng = np.random.default_rng(0)
    q_true = jnp.asarray(rng.uniform(-0.7, 0.7, 5), jnp.float32)
    target = kin.link_pose(c, q_true, "push_tool")
    # 5-dof: position + partial orientation; down-weight orientation
    res = jax.jit(lambda t, q0: kin.ik(c, "push_tool", t, q0,
                                       ori_weight=0.3))(
        target, q_true + 0.15 * jnp.asarray(rng.normal(size=5), jnp.float32))
    assert float(res.pos_err) < 5e-4


@pytest.mark.parametrize("pkg,urdf,ndof,target", [
    # scara quill joint is limited to [0, 0.18] (pushscara3.urdf:34) —
    # command it within limits and clear of the block so PD can converge
    ("pushscara3", "pushscara3.urdf", 3, [0.2, 0.2, 0.08]),
    ("pusharm5", "pusharm5.urdf", 5, [0.2] * 5),
])
def test_manipulator_env_runs(pkg, urdf, ndof, target):
    env = ManipulatorSimEnv(
        env_objects=True,
        visualise_flag=False,
        eef_link_name="push_tool",
        package_path=str(REPO / "robot_description"),
        package_name=pkg,
        urdf_name=urdf,
        num_dof=ndof,
    )
    obs = env.reset(reset_to_state={
        "robot_pos": [0.0] * ndof,
        "block_pos": [0.3, 0.0, 0.0, 0.0],
        "goal_pos": [0.4, 0.1, 0.0, 0.0],
    })
    assert obs["robot_joint_pos"].shape == (ndof,)
    target = np.asarray(target, np.float32)
    for _ in range(30):
        obs, reward, terminated, truncated, info = env.step(target)
    np.testing.assert_allclose(obs["robot_joint_pos"], target, atol=0.05)
    assert np.isfinite(reward)
    draw = env._generate_draw_msg()
    assert draw.poses.q.shape[0] == len(env.env_f.schema().links)
    env.close()
