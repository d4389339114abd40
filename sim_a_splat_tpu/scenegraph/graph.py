"""Articulated splat scene graph — the TPU-native ``SplatHandler``.

The reference (sim_a_splat/splat/splat_handler.py:23-346) keeps one viser
handle per robot link plus a static-background handle, and on every draw
message writes a similarity-conjugated SE(3) into each handle (:272-289,
hard-capped at 7 links).  Here the whole scene graph is two arrays:

- ``link_ids``: (N,) int32, one entry per gaussian; 0 = static background
  (the reference's ``/scene_ohne_robot`` handle, :104-119), 1..L = movable
  bodies (robot links :121-143 and task objects :199-219).
- ``rest_inv``: batched SE(3) (L+1,) — inverse of each body's world pose at
  the capture configuration (the FK-at-``joint_config`` poses the reference
  recomputes with urchin, :158-163), identity at index 0.

Posing the scene for a frame is then one gather + one batched quaternion
transform over all N gaussians — no per-link loop, no 7-link cap, identical
cost for 1 or 100 links, and directly ``vmap``-able over environments
(per-env ``body_poses`` only; the scene itself is shared device memory).

The ICP *similarity* transform that the reference conjugates through at every
draw call (splat_handler.py:272-278) is instead folded into the scene once at
load time (see scenegraph/registration.py); runtime transforms are pure
SE(3) in the simulator's world frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sim_a_splat_tpu.ops import quaternion as quat
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.splat.scene import GaussianScene


class SceneGraph(NamedTuple):
    """Splat scene + per-gaussian body assignment, all world-frame.

    ``scene`` is canonical: posed at the capture configuration, in the
    simulator's world frame (similarity already removed).
    """

    scene: GaussianScene
    link_ids: jnp.ndarray    # (N,) int32, 0 = static
    rest_inv: SE3            # (L+1,) batched; index 0 = identity

    @property
    def num_bodies(self) -> int:
        """L+1 (including the static slot 0)."""
        return self.rest_inv.q.shape[0]

    def posed(self, body_poses: SE3) -> GaussianScene:
        """Scene with every gaussian moved to its body's current pose.

        Args:
          body_poses: (L+1,) batched SE(3) world poses of each body for this
            frame (slot 0 must be identity; it is gathered for static
            gaussians).  The math per gaussian g with body l = link_ids[g]:

                T_g = X_l · X_l,rest⁻¹          (reference: splat_handler.py
                                                 :272-278 after similarity
                                                 conjugation cancels)
                mean' = T_g mean,  quat' = q(T_g) ⊗ quat

        Covariances follow for free since Σ = R(quat') S Sᵀ R(quat')ᵀ.
        """
        rel = body_poses.compose(self.rest_inv)          # (L+1,) batched
        q_g = rel.q[self.link_ids]                       # (N, 4)
        t_g = rel.t[self.link_ids]                       # (N, 3)
        s = self.scene
        return s._replace(
            means=quat.rotate(q_g, s.means) + t_g,
            quats=quat.multiply(q_g, s.quats),
        )

    @staticmethod
    def from_masks(
        scene: GaussianScene,
        masks: list[jnp.ndarray],
        rest_poses: SE3 | None = None,
    ) -> "SceneGraph":
        """Build from per-body boolean masks (the reference's
        ``link_masks_global_dict.npy`` values, splat_handler.py:62-83).

        Gaussians in no mask become static (id 0); overlapping masks resolve
        to the *last* body listed (the reference accumulates a union mask and
        would double-assign; explicit priority is strictly better).

        Args:
          scene: canonical world-frame scene.
          masks: L boolean arrays of shape (N,), body ids 1..L in list order.
          rest_poses: (L+1,) batched SE(3) capture-time world poses
            (slot 0 ignored).  Defaults to identity (bodies captured at
            their world origin — the common case after canonicalization
            when rest poses are pre-folded).
        """
        n = scene.num_gaussians
        link_ids = jnp.zeros((n,), jnp.int32)
        for i, m in enumerate(masks):
            link_ids = jnp.where(jnp.asarray(m), jnp.int32(i + 1), link_ids)
        L = len(masks)
        if rest_poses is None:
            rest_inv = SE3.identity((L + 1,))
        else:
            rest_inv = rest_poses.inverse()
            rest_inv = SE3(
                rest_inv.q.at[0].set(jnp.asarray([1.0, 0, 0, 0])),
                rest_inv.t.at[0].set(0.0),
            )
        return SceneGraph(scene=scene, link_ids=link_ids, rest_inv=rest_inv)


def body_poses_from_parts(quats: jnp.ndarray, translations: jnp.ndarray) -> SE3:
    """Convenience: stack (L+1, 4) wxyz + (L+1, 3) into a batched SE3."""
    return SE3(jnp.asarray(quats), jnp.asarray(translations))
