"""Manipulator env family (reference tests/test_gym_env.py +
test_eef_wrapper.py scenarios, with real assertions)."""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.envs import (
    ManipulatorEEFWrapper, ManipulatorEnvF, ManipulatorSimEnv,
)
from sim_a_splat_tpu.messaging import ROBOT_NUM_ROBOT, ROBOT_NUM_TASK
from sim_a_splat_tpu.physics import kinematics as kin

XARM_PKG = Path("/root/reference/robot_description/xarm_description")
PLANAR = Path(__file__).parent / "assets" / "planar2.urdf"

needs_xarm = pytest.mark.skipif(not XARM_PKG.exists(),
                                reason="reference URDFs not mounted")


def make_env(**kw):
    return ManipulatorSimEnv(
        env_objects=kw.pop("env_objects", True),
        eef_link_name="push_gripper_base_link",
        package_path=str(XARM_PKG.parent),
        package_name="xarm_description/xarm6",
        urdf_name="xarm6_with_push_gripper.urdf",
        num_dof=6,
        seed=kw.pop("seed", 0),
        **kw,
    )


@needs_xarm
def test_env_api_and_spaces():
    env = make_env()
    obs = env.reset(reset_to_state={
        "robot_pos": np.zeros(6),
        "block_pos": np.array([0.45, 0.1, 0.2, 0.3]),
        "goal_pos": np.array([0.475, 0.0, 0.2, 0.78539816]),
    })
    assert set(obs) == {"robot_joint_pos", "robot_joint_vel"}
    assert obs["robot_joint_pos"].shape == (6,)
    o2, r, term, trunc, info = env.step(np.zeros(6))
    assert isinstance(r, float) and r <= 0.0
    for k in ["eef_pos", "eef_quat", "eef_pos_vel", "eef_rot_vel",
              "block_pose", "block_vel", "timestamp"]:
        assert k in info
    assert info["block_pose"].shape == (7,)


@needs_xarm
def test_joint_targets_tracked():
    env = make_env(env_objects=False)
    env.reset(reset_to_state={"robot_pos": np.zeros(6)})
    target = np.asarray([0.3, -0.4, 0.2, 0.1, -0.2, 0.5], np.float32)
    for _ in range(150):   # 1.5 s of PD settling
        obs, *_ = env.step(target)
    np.testing.assert_allclose(obs["robot_joint_pos"], target, atol=2e-2)


@needs_xarm
def test_reward_and_done_at_goal():
    env = make_env()
    env.reset(reset_to_state={
        "robot_pos": np.zeros(6),
        "block_pos": np.array([0.475, 0.0, 0.2, 0.78539816]),
        "goal_pos": np.array([0.475, 0.0, 0.2, 0.78539816]),
    })
    _, r, term, *_ = env.step(np.zeros(6))
    assert abs(r) < 0.02 and term


@needs_xarm
def test_draw_state_schema():
    env = make_env()
    env.reset(reset_to_state={"robot_pos": np.zeros(6)})
    schema = env._generate_loader_msg()
    draw = env._generate_draw_msg()
    assert draw.poses.q.shape[0] == len(schema.links)
    assert schema.links[-1].name == "plant::tblock_paper"
    assert schema.links[-1].robot_num == ROBOT_NUM_TASK
    assert all(l.robot_num == ROBOT_NUM_ROBOT for l in schema.links[:-1])
    # link names carry the plant:: prefix of the reference draw msg
    assert schema.links[0].name.startswith("plant::")


@needs_xarm
@pytest.mark.slow
def test_eef_wrapper_step_and_ik_failure():
    env = make_env(env_objects=False)
    wrapper = ManipulatorEEFWrapper(env)
    obs = wrapper.reset(reset_to_state={
        "robot_pos": np.array([0.0, -0.3, -0.5, 0.0, 0.6, 0.0])})
    start_pos = np.asarray(obs["eef_pos"])
    rpy = np.asarray(kin.orientation_error(
        jnp.asarray(obs["eef_quat"]), jnp.asarray([1.0, 0, 0, 0])))
    # small task-space step from the current pose (reference
    # tests/test_eef_wrapper.py random-walk pattern)
    from sim_a_splat_tpu.ops import quaternion as q_ops
    cur_rpy = np.asarray(q_ops.to_rpy(jnp.asarray(obs["eef_quat"])))
    act = {"eef_pos": start_pos + np.array([0.0, 0.0, -0.01]),
           "eef_ori": cur_rpy}
    for _ in range(20):
        obs, r, term, trunc, info = wrapper.step(act)
    np.testing.assert_allclose(np.asarray(obs["eef_pos"]),
                               act["eef_pos"], atol=5e-3)
    # unreachable target raises like the reference (:79-80)
    with pytest.raises(RuntimeError, match="Inverse kinematics failed"):
        wrapper.step({"eef_pos": np.array([3.0, 3.0, 3.0]),
                      "eef_ori": np.zeros(3)})


@needs_xarm
@pytest.mark.slow
def test_eef_pushes_block():
    envf_env = make_env(seed=3)
    f = envf_env.env_f
    state, _ = f.reset(jax.random.key(0), {
        "robot_pos": np.zeros(6),
        "block_pos": np.array([0.45, 0.0, 0.2, 0.0]),
        "goal_pos": np.array([0.475, 0.0, 0.2, 0.78539816]),
    })
    # plan: IK the EEF to just behind the block, then sweep through it
    from sim_a_splat_tpu.envs.eef_wrapper import ManipulatorEEFWrapperF
    w = ManipulatorEEFWrapperF(env=f)
    step = jax.jit(f.step)
    ik = jax.jit(w.eefpose2config)
    b0 = np.asarray(state.block_pos).copy()
    down = jnp.asarray([np.pi, 0.0, 0.0], jnp.float32)  # EEF pointing down
    for i in range(60):
        x = 0.38 + 0.002 * i
        res = ik(state, jnp.asarray(
            [x, 0.0, 0.02, *np.asarray(down)], jnp.float32))
        tr = step(state, res.q)
        state = tr.state
    b1 = np.asarray(state.block_pos)
    assert np.linalg.norm(b1 - b0) > 0.005, (b0, b1)


def test_planar_chain_env_no_reference_needed():
    # fully self-contained smoke on the bundled 2-dof fixture
    chain = kin.load_chain(PLANAR)
    f = ManipulatorEnvF(chain=chain, eef_link="tool", env_objects=False)
    state, obs = f.reset(jax.random.key(0),
                         {"robot_pos": np.zeros(2)})
    tr = jax.jit(f.step)(state, jnp.asarray([0.4, -0.2]))
    assert np.isfinite(np.asarray(tr.obs["robot_joint_pos"])).all()
    assert tr.info["eef_pos"].shape == (3,)
