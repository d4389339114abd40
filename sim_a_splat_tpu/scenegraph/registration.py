"""Segmentation/registration artifacts and the similarity fold-in.

The offline matcher (reference match_splat.py, re-built TPU-side in
tools/match.py) produces:

- ``link_masks_global_dict.npy`` — {link_name: (N,) bool} global splat masks
- ``icp_transformation.npy``     — 4×4 similarity, robot/world → splat coords
- ``joint_config.npy``           — joint config at which the splat was trained

The reference consumes these *at runtime*: every draw call conjugates each
link's rigid motion through the similarity (splat_handler.py:272-278) and
every attached camera goes through ``get_attached_frame`` (:316-332).

Here the similarity is folded in **once at load time**: ``canonicalize``
maps the entire splat into the simulator's world frame (scale absorbed into
``log_scales``), after which runtime is pure SE(3) (see scenegraph/graph.py)
and cameras are specified directly in world coordinates.  A pinhole camera
is similarity-invariant, so renders are bit-for-bit the same scene — the
parity tests check world-frame rendering against the reference's
splat-frame conjugation math.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from sim_a_splat_tpu.ops import quaternion as quat
from sim_a_splat_tpu.ops.transforms import SE3, Sim3
from sim_a_splat_tpu.splat.scene import GaussianScene


def load_link_masks(path: str | Path) -> dict[str, np.ndarray]:
    """Load ``link_masks_global_dict.npy`` ({name: (N,) bool}, pickled dict
    as written by the reference matcher, match_splat.py:284)."""
    d = np.load(path, allow_pickle=True).item()
    return {str(k): np.asarray(v, bool) for k, v in d.items()}


def load_icp_sim3(path: str | Path) -> Sim3:
    """Load ``icp_transformation.npy`` (4×4 similarity) with the same
    orthogonality/isotropy validation as splat_handler.py:71-77."""
    return Sim3.from_matrix(np.load(path))


def canonicalize(scene: GaussianScene, icp: Sim3) -> GaussianScene:
    """Map a splat-frame scene into the simulator's world frame.

    Applies ``icp⁻¹`` to every gaussian: means through the full similarity,
    quats through the rotation, the isotropic scale into ``log_scales``.
    Replaces the reference's runtime conjugation (splat_handler.py:272-278)
    with a one-time preprocessing step.
    """
    inv = icp.inverse()
    return scene._replace(
        means=inv.apply(scene.means),
        quats=quat.multiply(inv.q, scene.quats),
        log_scales=scene.log_scales + jnp.log(inv.s),
    )


def splat_to_world_pose(pose: SE3, icp: Sim3) -> SE3:
    """Convert a camera/body pose given in splat coordinates (the frame the
    reference's viser cameras live in) to world coordinates."""
    inv = icp.inverse()
    return SE3(quat.multiply(inv.q, pose.q), inv.apply(pose.t))


def world_to_splat_pose(pose: SE3, icp: Sim3) -> SE3:
    return SE3(quat.multiply(icp.q, pose.q), icp.apply(pose.t))


def conjugated_link_transform(icp: Sim3, x_now: SE3, x_rest: SE3) -> SE3:
    """The reference's per-link runtime transform, verbatim semantics.

    splat_handler.py:272-278 computes, for a link with capture-time FK pose
    ``x_rest`` and current sim pose ``x_now``::

        rot = Ri·Rm·Rfkᵀ·Riᵀ
        pos = −rot·ti − s·Ri·Rm·Rfkᵀ·t_fk + s·Ri·t_m + ti

    which is exactly the similarity conjugation
    ``icp ∘ x_now ∘ x_rest⁻¹ ∘ icp⁻¹`` (scale cancels ⇒ SE(3)).  Kept for
    the parity tests that pin world-frame rendering to the reference math.
    """
    m = icp.compose_se3(x_now.compose(x_rest.inverse())).compose(icp.inverse())
    return SE3(m.q, m.t)   # m.s == 1 up to fp


def attached_frame(
    icp: Sim3,
    link_pose_world: SE3,
    local_offset: jnp.ndarray,
    rotate_offset: bool = False,
) -> SE3:
    """Splat-frame pose of a link-attached camera — ``get_attached_frame``
    (splat_handler.py:316-332).

    The reference adds ``local_offset`` in *world axes* (not rotated into
    the link frame) before scaling: pose = icp_SE3 ∘ (q_link,
    s·(t_link + offset)).  ``rotate_offset=True`` gives the arguably
    intended link-frame offset instead.
    """
    off = quat.rotate(link_pose_world.q, local_offset) if rotate_offset else local_offset
    p = SE3(link_pose_world.q, icp.s * (link_pose_world.t + off))
    rigid = icp.se3()
    return rigid.compose(p)


def attached_frame_world(
    link_pose_world: SE3,
    local_offset: jnp.ndarray,
    rotate_offset: bool = False,
) -> SE3:
    """World-frame equivalent for canonicalized scenes: the link-attached
    camera pose used by moving cameras (splat_env_wrapper.py:140-148)."""
    off = quat.rotate(link_pose_world.q, local_offset) if rotate_offset else local_offset
    return SE3(link_pose_world.q, link_pose_world.t + off)
