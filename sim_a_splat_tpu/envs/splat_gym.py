"""Stateful Gymnasium splat wrapper — ctor parity with the reference C17.

The reference ``SplatEnvWrapper`` (splat_env_wrapper.py:13-163) is a
``gym.Wrapper`` constructed from *asset paths*: it loads the segmentation
artifacts (``masks/<name>/{link_masks_global_dict, icp_transformation,
joint_config}.npy``), the trained splat run, and the task mesh, brings up a
viser server, and blocks until a browser client connects (:87-94) because
the browser is the renderer.

This class keeps the exact constructor and method surface —
``SplatEnvWrapper(env, splat_assets_path, match_object_name,
splat_config_name, task_assets_path, task_assets_name)`` +
``_configure_cameras(dict)`` / ``reset`` / ``step(action, noobs)`` /
``render`` / ``_get_obs`` / ``close`` — but renders in-process through the
TPU tile rasterizer via the functional :class:`SplatEnvWrapperF`.  No
server, no client wait, no websocket round-trip per camera.

Differences forced by being TPU-native:

- The task object (reference: a trimesh handle rendered by the browser,
  splat_handler.py:199-219) is converted once to gaussians
  (tools/mesh_to_splat.py) so one renderer draws the whole scene.
- Camera ``local_frame`` accepts viser-style objects (``.wxyz_xyz`` or
  ``.rotation()/.translation()``), 4×4 matrices, or ``(q_wxyz, t)`` pairs;
  poses are interpreted in the splat frame exactly like the reference's
  viser cameras and converted to world once at configure time.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import gymnasium as gym
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.envs.splat_wrapper import CameraSpec, SplatEnvWrapperF
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.physics import kinematics as kin
from sim_a_splat_tpu.scenegraph import load_icp_sim3, load_link_masks, world_to_splat_pose
from sim_a_splat_tpu.splat import loaders
from sim_a_splat_tpu.splat.scene import GaussianScene
from sim_a_splat_tpu.tools.mesh_to_splat import concat_scenes, mesh_to_splat
from sim_a_splat_tpu.tools.meshio import load_mesh

TASK_MASK_KEY = "__task__"


def _as_pose_tuple(local_frame) -> tuple:
    """Normalize a camera/local frame to (q wxyz, t) tuples."""
    if hasattr(local_frame, "wxyz_xyz"):                 # viser tf.SE3
        v = np.asarray(local_frame.wxyz_xyz, np.float64)
        return tuple(v[:4]), tuple(v[4:])
    if hasattr(local_frame, "rotation"):                 # viser / drake-like
        q = np.asarray(local_frame.rotation().wxyz)
        t = np.asarray(local_frame.translation())
        return tuple(q), tuple(t)
    arr = np.asarray(local_frame, dtype=object)
    if arr.shape == (4, 4):
        m = SE3.from_matrix(jnp.asarray(local_frame, jnp.float32))
        return tuple(np.asarray(m.q)), tuple(np.asarray(m.t))
    q, t = local_frame
    return tuple(np.asarray(q, np.float64)), tuple(np.asarray(t, np.float64))


class SplatEnvWrapper(gym.Wrapper):
    """Reference API twin of ``SplatEnvWrapper`` (splat_env_wrapper.py:13)."""

    def __init__(
        self,
        env: gym.Env,
        splat_assets_path: str | Path,
        match_object_name: str,
        splat_config_name: str,
        task_assets_path: Optional[str | Path] = None,
        task_assets_name: Optional[str] = None,
        raster: RasterConfig = RasterConfig(tile_capacity=1024, chunk=128),
        task_splat_count: int = 2000,
        robot_mesh_overlay: bool = False,
        robot_mesh_splat_count: int = 600,
    ):
        super().__init__(env)
        self._raster = raster
        assets = Path(splat_assets_path)

        # segmentation artifacts (reference _load_saved_masks,
        # splat_handler.py:62-83)
        masks_dir = assets / "masks" / match_object_name
        self.link_masks = load_link_masks(
            masks_dir / "link_masks_global_dict.npy")
        self.icp = load_icp_sim3(masks_dir / "icp_transformation.npy")
        self.joint_config = np.load(masks_dir / "joint_config.npy")

        # trained splat (reference _load_saved_splats → GSplatLoader,
        # splat_handler.py:85-102); config path layout
        # `<assets>/splatfacto/<run>/config.yml` as in the demos
        self.scene_splat_frame = self._load_scene(assets, splat_config_name)

        # task object: mesh → gaussians, expressed in the *splat* frame so
        # the whole scene shares one canonicalization (the reference keeps
        # it as a browser mesh handle instead, splat_handler.py:199-219)
        masks = dict(self.link_masks)
        task_mask_key = None
        if task_assets_path is not None and task_assets_name is not None:
            mesh = load_mesh(Path(task_assets_path) / task_assets_name)
            task = mesh_to_splat(mesh, n=task_splat_count,
                                 color=(0.8, 0.3, 0.25))
            from sim_a_splat_tpu.ops import quaternion as quat
            task = task._replace(
                means=self.icp.apply(task.means),
                quats=quat.multiply(self.icp.q, task.quats),
                log_scales=task.log_scales + jnp.log(self.icp.s),
            )
            n_scene = self.scene_splat_frame.num_gaussians
            n_task = task.num_gaussians
            self.scene_splat_frame = concat_scenes(self.scene_splat_frame,
                                                   task)
            masks = {k: np.concatenate([v, np.zeros(n_task, bool)])
                     for k, v in masks.items()}
            masks[TASK_MASK_KEY] = np.concatenate(
                [np.zeros(n_scene, bool), np.ones(n_task, bool)])
            task_mask_key = TASK_MASK_KEY
        # optional robot link-mesh overlay: URDF visuals → disk gaussians in
        # the splat frame, added to each link's mask so they pose with the
        # link's splats (the reference's viser trimesh handles,
        # splat_handler.py:145-197)
        if robot_mesh_overlay:
            from sim_a_splat_tpu.scenegraph.mesh_overlay import visual_mesh

            base_f = self.unwrapped.env_f
            q_rest = jnp.asarray(self.joint_config, jnp.float32)
            rest_fk = kin.fk(base_f.chain, q_rest, base_f._base())
            robot_keys = sorted(self.link_masks,
                                key=lambda s: (len(s), s))

            def resolve(uri: str) -> Path:
                pp = getattr(self.unwrapped, "package_path", None)
                if uri.startswith("package://") and pp is not None:
                    return Path(pp) / uri[len("package://"):]
                return Path(uri)

            from sim_a_splat_tpu.ops import quaternion as quat
            j = 0
            for i, name in enumerate(base_f.chain.link_names):
                if name == "world":
                    continue
                if j >= len(robot_keys):
                    break
                key = robot_keys[j]
                j += 1
                vis = base_f.chain.visuals[i]
                if vis is None:
                    continue
                mesh = visual_mesh(vis, resolve)
                part = mesh_to_splat(mesh, n=robot_mesh_splat_count,
                                     color=tuple(vis.color[:3]), seed=11 + i)
                # link local → world at capture config → splat frame
                part = part._replace(
                    means=self.icp.apply(
                        quat.rotate(rest_fk.q[i], part.means) + rest_fk.t[i]),
                    quats=quat.multiply(
                        self.icp.q, quat.multiply(rest_fk.q[i], part.quats)),
                    log_scales=part.log_scales + jnp.log(self.icp.s),
                )
                n_new = part.num_gaussians
                self.scene_splat_frame = concat_scenes(
                    self.scene_splat_frame, part)
                masks = {k: np.concatenate([v, np.full(n_new, k == key)])
                         for k, v in masks.items()}
        self._masks = masks
        self._task_mask_key = task_mask_key

        self.wrapper_f: SplatEnvWrapperF | None = None
        self._jit_render = None
        self.camera_setup_info: dict = {}
        self.render_cam_keys: list = []

    @staticmethod
    def _load_scene(assets: Path, splat_config_name: str) -> GaussianScene:
        cand = assets / "splatfacto" / splat_config_name
        if not cand.exists():
            cand = assets / splat_config_name
        if cand.name == "config.yml":
            return loaders.load_nerfstudio(cand.parent)
        if cand.is_dir():
            return loaders.load_nerfstudio(cand)
        return loaders.load(cand)

    # --- camera configuration (splat_env_wrapper.py:33-65) ------------------

    def _configure_cameras(self, camera_setup_info: dict) -> None:
        specs = {}
        for key, info in camera_setup_info.items():
            q, t = _as_pose_tuple(info["local_frame"])
            specs[key] = CameraSpec(
                type=info["type"],
                render_size=tuple(info["render_size"]),
                local_frame=(q, t),
                link_name=info.get("link_name"),
                fov=float(info.get("fov", 1.3089)),
            )
        self.camera_setup_info = camera_setup_info

        base_f = self.unwrapped.env_f
        q_rest = jnp.asarray(self.joint_config, jnp.float32)
        rest_fk = kin.fk(base_f.chain, q_rest, base_f._base())

        # body order = sorted robot mask keys then task; rest pose of robot
        # body j = capture-time FK pose of the j-th non-world robot link
        # (the sequential local_idx walk of splat_handler.py:238-289)
        robot_keys = sorted([k for k in self._masks
                             if k != self._task_mask_key],
                            key=lambda s: (len(s), s))
        chain_links = [n for n in base_f.chain.link_names if n != "world"]
        if len(robot_keys) != len(chain_links):
            # positional pairing (reference splat_handler.py:238-289) —
            # a count mismatch silently shifts every subsequent link's
            # splats, so fail loudly instead
            raise ValueError(
                f"link-mask/chain mismatch: {len(robot_keys)} robot mask "
                f"keys {robot_keys} vs {len(chain_links)} non-world chain "
                f"links {chain_links}; the pairing is positional, so "
                "counts must match exactly")
        rest_q, rest_t = [[1.0, 0, 0, 0]], [[0.0, 0, 0]]
        j = 0
        for i, name in enumerate(base_f.chain.link_names):
            if name == "world":
                continue
            rest_q.append(np.asarray(rest_fk.q[i]))
            rest_t.append(np.asarray(rest_fk.t[i]))
            j += 1
        if self._task_mask_key is not None:
            # task gaussians were generated in the block's local frame
            rest_q.append([1.0, 0, 0, 0]); rest_t.append([0.0, 0, 0])
        rest_poses = SE3(jnp.asarray(np.asarray(rest_q), jnp.float32),
                         jnp.asarray(np.asarray(rest_t), jnp.float32))

        self.wrapper_f = SplatEnvWrapperF.build(
            env=base_f,
            scene=self.scene_splat_frame,
            link_masks=self._masks,
            camera_setup_info=specs,
            icp=self.icp,
            rest_poses_world=rest_poses,
            task_mask_key=self._task_mask_key,
            scene_frame="splat",
            raster=self._raster,
        )
        self.render_cam_keys = [k for k, _ in self.wrapper_f.cameras]
        wf = self.wrapper_f
        self._jit_render = jax.jit(lambda draw: wf.render(None, draw))

    # --- env API (splat_env_wrapper.py:97-163) -------------------------------

    def reset(self, seed: Optional[int] = None, reset_to_state=None):
        obs = self.unwrapped.reset(seed=seed, reset_to_state=reset_to_state)
        self.draw_msg = self.unwrapped._generate_draw_msg()
        return obs

    def step(self, action, noobs: bool = False):
        obs_in, reward, terminated, truncated, info_in = self.env.step(action)
        self.draw_msg = self.unwrapped._generate_draw_msg()
        observation = None if noobs else self._get_obs()
        return observation, reward, terminated, truncated, info_in

    def _get_obs(self) -> dict:
        obs = self.unwrapped._get_obs()
        for i, img in enumerate(self.render()):
            obs[f"camera_{i}"] = np.moveaxis(img, -1, 0)
        return obs

    def render(self, mode: str = "rgb_array") -> list:
        """One (H, W, 3) float image per configured camera, in
        ``render_cam_keys`` order (moving first, then fixed)."""
        if self._jit_render is None:
            raise RuntimeError(
                "cameras not configured — call _configure_cameras first")
        if not hasattr(self, "draw_msg"):
            self.draw_msg = self.unwrapped._generate_draw_msg()
        return [np.asarray(img) for img in self._jit_render(self.draw_msg)]

    def render_free_camera(self, camera) -> np.ndarray:
        """Render the current scene state from an arbitrary
        :class:`~sim_a_splat_tpu.ops.projection.Camera` (world frame) —
        the interactive-viewer path (reference: browser orbit camera)."""
        if self.wrapper_f is None:
            raise RuntimeError(
                "cameras not configured — call _configure_cameras first")
        if not hasattr(self, "draw_msg"):
            self.draw_msg = self.unwrapped._generate_draw_msg()
        return np.asarray(self.wrapper_f.render_camera(self.draw_msg, camera))

    def close(self):
        self.env.close()
