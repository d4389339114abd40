"""Shared plumbing for the example drivers.

The reference demos (examples/demo_*.py) hard-code asset paths to trained
splatfacto scenes whose checkpoints are git-LFS stubs; these examples
instead bootstrap a self-contained synthetic scene once (into
``examples/assets/``) with the exact artifact schema of the offline
matcher, then build the same env stack: ``ManipulatorSimEnv`` →
(optional ``ManipulatorEEFWrapper``) → ``SplatEnvWrapper`` with a viewport
plus an EEF-mounted moving camera (demo_pusht_splat.py:54-78).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

if os.environ.get("SIM_A_SPLAT_FORCE_CPU"):
    # CI/smoke hook: force the CPU backend before any backend init — an
    # installed TPU plugin otherwise wins over JAX_PLATFORMS (see
    # tests/conftest.py for the same dance)
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:       # run the examples from anywhere
    sys.path.insert(0, str(REPO))
ASSETS = Path(__file__).resolve().parent / "assets"
URDF = REPO / "robot_description" / "pusharm6" / "urdf" / "pusharm6.urdf"
EEF_LINK = "push_tool"
NUM_DOF = 6
JOINT_CONFIG = np.asarray([0.0, -0.45, 0.85, 0.0, 0.35, 0.0], np.float32)
# push-ready home: tool pointing down, EEF near the workspace center
HOME_Q = np.asarray([0.0, 0.785, 0.89, 0.0, 1.466, 0.0], np.float32)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_demo_assets() -> dict:
    """Generate the synthetic splat + segmentation artifacts once."""
    from sim_a_splat_tpu.tools.demo_assets import build_demo_assets

    marker = ASSETS / "masks" / "pusharm6" / "link_masks_global_dict.npy"
    if not marker.exists():
        log("bootstrapping demo assets (first run only)...")
        return build_demo_assets(ASSETS, URDF, joint_config=JOINT_CONFIG)
    return {
        "assets": ASSETS,
        "splat_config_name": "demo-run/splat.npz",
        "match_object_name": "pusharm6",
        "task_assets_path": ASSETS / "tblock_paper",
        "task_assets_name": "tblock_paper.obj",
        "joint_config": JOINT_CONFIG,
    }


def look_at(eye, target, up=(0.0, 0.0, 1.0)):
    """OpenCV camera-to-world pose (+z forward, +y down) → (q wxyz, t)."""
    from sim_a_splat_tpu.ops import quaternion as quat
    import jax.numpy as jnp

    eye = np.asarray(eye, np.float64)
    z = np.asarray(target, np.float64) - eye
    z /= max(np.linalg.norm(z), 1e-12)
    x = np.cross(z, np.asarray(up, np.float64))
    x /= max(np.linalg.norm(x), 1e-12)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)
    q = np.asarray(quat.from_rotation_matrix(jnp.asarray(R, jnp.float32)))
    return tuple(q), tuple(eye)


def camera_setup(render_size=(240, 320)) -> dict:
    """Viewport + EEF-mounted moving camera, splat-frame poses (the same
    two-camera layout as demo_pusht_splat.py:54-78)."""
    from sim_a_splat_tpu.scenegraph import load_icp_sim3, world_to_splat_pose
    from sim_a_splat_tpu.ops.transforms import SE3
    import jax.numpy as jnp

    icp = load_icp_sim3(
        ASSETS / "masks" / "pusharm6" / "icp_transformation.npy")
    q, t = look_at([1.1, -0.9, 0.9], [0.35, 0.0, 0.25])
    view = world_to_splat_pose(
        SE3(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32)), icp)
    return {
        0: {
            "link_name": "world",
            "local_frame": (tuple(np.asarray(view.q)),
                            tuple(np.asarray(view.t))),
            "type": "viewport",
            "render_size": list(render_size),
        },
        1: {
            "link_name": EEF_LINK,
            "local_frame": ((1.0, 0.0, 0.0, 0.0), (-0.1, 0.0, 0.033)),
            "type": "moving",
            "render_size": list(render_size),
        },
    }


def make_manipulator_splat_env(eef: bool = True, render_size=(240, 320),
                               weld_frame_transform=None,
                               robot_mesh_overlay: bool = False):
    """The full demo stack (reference demo_pusht_splat.py:44-87).

    ``robot_mesh_overlay`` additionally draws the URDF link visuals next to
    the splats (the reference's viser mesh handles,
    splat_handler.py:145-197)."""
    from sim_a_splat_tpu.envs import (
        ManipulatorEEFWrapper, ManipulatorSimEnv, SplatEnvWrapper,
    )

    paths = ensure_demo_assets()
    env = ManipulatorSimEnv(
        env_objects=True,
        visualise_flag=False,
        eef_link_name=EEF_LINK,
        package_path=str(REPO / "robot_description"),
        package_name="pusharm6",
        urdf_name="pusharm6.urdf",
        num_dof=NUM_DOF,
        weld_frame_transform=weld_frame_transform,
    )
    if eef:
        env = ManipulatorEEFWrapper(env)
    splat_env = SplatEnvWrapper(
        env,
        splat_assets_path=paths["assets"],
        match_object_name=paths["match_object_name"],
        splat_config_name=paths["splat_config_name"],
        task_assets_path=paths["task_assets_path"],
        task_assets_name=paths["task_assets_name"],
        robot_mesh_overlay=robot_mesh_overlay,
    )
    splat_env._configure_cameras(camera_setup(render_size))
    return splat_env


def save_ppm(path: str | Path, img: np.ndarray) -> None:
    """Write an (H, W, 3) float image as binary PPM (no image-lib dep)."""
    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())
