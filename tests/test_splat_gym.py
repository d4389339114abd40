"""Stateful gym-level SplatEnvWrapper + demo asset bootstrap.

Covers the reference's asset-path constructor contract
(splat_env_wrapper.py:13-31: masks dir + splatfacto run + task mesh),
camera configuration with splat-frame poses, and the ``camera_{i}`` obs
contract at the gym level (the functional layer is covered in
test_splat_wrapper.py).
"""

from pathlib import Path

import numpy as np
import pytest

from sim_a_splat_tpu.envs import ManipulatorSimEnv, SplatEnvWrapper
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
from sim_a_splat_tpu.tools.demo_assets import build_demo_assets, tblock_mesh

URDF = (Path(__file__).parent.parent / "robot_description" / "pusharm6" /
        "urdf" / "pusharm6.urdf")
JOINT_CONFIG = np.asarray([0.0, -0.45, 0.85, 0.0, 0.35, 0.0], np.float32)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("demo_assets")
    return build_demo_assets(root, URDF, joint_config=JOINT_CONFIG,
                             n_per_link=80, n_ground=500)


@pytest.fixture(scope="module")
def splat_env(assets):
    env = ManipulatorSimEnv(
        env_objects=True, eef_link_name="push_tool",
        package_path=str(URDF.parent.parent.parent),
        package_name="pusharm6", urdf_name="pusharm6.urdf", num_dof=6)
    wrapper = SplatEnvWrapper(
        env,
        splat_assets_path=assets["assets"],
        match_object_name=assets["match_object_name"],
        splat_config_name=assets["splat_config_name"],
        task_assets_path=assets["task_assets_path"],
        task_assets_name=assets["task_assets_name"],
        raster=RasterConfig(tile_capacity=512, chunk=64),
        task_splat_count=300,
    )
    from sim_a_splat_tpu.scenegraph import load_icp_sim3, world_to_splat_pose
    from sim_a_splat_tpu.ops.transforms import SE3
    import jax.numpy as jnp
    icp = load_icp_sim3(assets["masks_dir"] / "icp_transformation.npy")
    view = world_to_splat_pose(
        SE3(jnp.asarray([0.2706, -0.6533, 0.6533, 0.2706]),
            jnp.asarray([1.0, 0.0, 0.8])), icp)
    wrapper._configure_cameras({
        0: {"link_name": "world",
            "local_frame": (np.asarray(view.q), np.asarray(view.t)),
            "type": "viewport", "render_size": [48, 64]},
        1: {"link_name": "push_tool",
            "local_frame": ((1.0, 0, 0, 0), (-0.1, 0.0, 0.033)),
            "type": "moving", "render_size": [48, 64]},
    })
    return wrapper


def test_artifact_schema(assets):
    """The matcher's exact artifact schema (match_splat.py:69,:223,:284)."""
    d = np.load(assets["masks_dir"] / "link_masks_global_dict.npy",
                allow_pickle=True).item()
    assert sorted(d) == [f"link{i}" for i in range(8)]
    icp = np.load(assets["masks_dir"] / "icp_transformation.npy")
    assert icp.shape == (4, 4)
    sR = icp[:3, :3]
    s2 = (sR.T @ sR)[0, 0]
    assert np.allclose(sR.T @ sR, np.eye(3) * s2, atol=1e-6)
    assert np.allclose(np.sqrt(s2), 0.2112, atol=1e-4)
    jc = np.load(assets["masks_dir"] / "joint_config.npy")
    assert jc.shape == (6,)
    mesh = tblock_mesh()
    assert mesh.num_faces == 24


@pytest.mark.slow
def test_obs_contract(splat_env):
    obs0 = splat_env.reset(reset_to_state={
        "robot_pos": [0.0] * 6, "block_pos": [0, 0, 0, 0],
        "goal_pos": [0, 0, 0, 0]})
    # reference reset returns the *unwrapped* obs (splat_env_wrapper.py:103)
    assert "camera_0" not in obs0
    obs, rew, term, trunc, info = splat_env.step(np.zeros(6))
    assert obs["camera_0"].shape == (3, 48, 64)
    assert obs["camera_1"].shape == (3, 48, 64)
    assert splat_env.render_cam_keys[0] == 1   # moving first (:53-55)
    assert np.isfinite(obs["camera_0"]).all()
    assert obs["camera_0"].max() > 0.05        # scene is visible


def test_noobs_and_motion(splat_env):
    splat_env.reset(reset_to_state={
        "robot_pos": [0.0] * 6, "block_pos": [0, 0, 0, 0],
        "goal_pos": [0, 0, 0, 0]})
    obs, *_ = splat_env.step(np.zeros(6))
    none_obs, *_ = splat_env.step(np.zeros(6), noobs=True)
    assert none_obs is None
    for _ in range(20):
        obs2, *_ = splat_env.step(np.asarray([1.2, 0.7, 0, 0, 0, 0]))
    # viewport sees the robot move; EEF camera sees the world move
    assert np.abs(obs2["camera_0"] - obs["camera_0"]).mean() > 1e-3
    assert np.abs(obs2["camera_1"] - obs["camera_1"]).mean() > 1e-3


def test_examples_import_and_helpers():
    import sys
    sys.path.insert(0, str(Path(__file__).parent.parent / "examples"))
    try:
        import common
        import demo_pusht_splat
        q, t = common.look_at([1.0, 0.0, 1.0], [0.0, 0.0, 0.0])
        from sim_a_splat_tpu.ops import quaternion as quat
        import jax.numpy as jnp
        R = np.asarray(quat.to_rotation_matrix(jnp.asarray(q)))
        fwd = R[:, 2]
        assert np.allclose(fwd, np.asarray([-1, 0, -1]) / np.sqrt(2),
                           atol=1e-5)
        assert R[:, 1][2] < 0          # +y (image down) points world-down
        a = demo_pusht_splat.map_actions(np.asarray([149.0, 256.0]))
        assert 0.30 <= a[0] <= 0.52 and -0.20 <= a[1] <= 0.20
        assert demo_pusht_splat.map_actions(None) is None
    finally:
        sys.path.pop(0)
