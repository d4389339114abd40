"""Keypoint sampling and mapping for pushT observations.

Capability twin of ``PymunkKeypointManager`` (reference
pymunk_keypoint_manager.py): the reference rasterizes each body's
silhouette offscreen with pygame, inverse-affines pixels to local coords
and farthest-point-samples keypoints.  Here keypoints are farthest-point
sampled directly from dense points in the analytic shape geometry — same
output contract ((N, 2) local keypoints per body; 9 block / 3 agent by
default), no renderer in the loop, deterministic per seed.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sim_a_splat_tpu.physics import pusht
from sim_a_splat_tpu.physics.planar import rot2d
from sim_a_splat_tpu.physics.pusht import PushTParams


def farthest_point_sampling(points: np.ndarray, n_points: int,
                            init_idx: int = 0) -> np.ndarray:
    """Greedy FPS — same algorithm as the reference's naive O(N²) version
    (pymunk_keypoint_manager.py:11-25), vectorized."""
    assert n_points >= 1
    chosen = [points[init_idx]]
    dists = np.linalg.norm(points - points[init_idx], axis=-1)
    for _ in range(n_points - 1):
        nxt = int(np.argmax(dists))
        chosen.append(points[nxt])
        dists = np.minimum(dists, np.linalg.norm(points - points[nxt], axis=-1))
    return np.asarray(chosen)


def _dense_block_points(params: PushTParams, spacing: float = 3.0) -> np.ndarray:
    polys = np.asarray(pusht.tee_polys_local(params.scale, params.length))
    pts = []
    for p in polys:
        lo, hi = p.min(0), p.max(0)
        xs = np.arange(lo[0], hi[0] + 1e-6, spacing)
        ys = np.arange(lo[1], hi[1] + 1e-6, spacing)
        g = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
        pts.append(g)
    return np.concatenate(pts)


def _dense_agent_points(params: PushTParams, spacing: float = 3.0) -> np.ndarray:
    r = params.agent_radius
    xs = np.arange(-r, r + 1e-6, spacing)
    g = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2)
    return g[np.linalg.norm(g, axis=-1) <= r]


def default_keypoint_map(
    params: PushTParams = PushTParams(),
    n_block_kps: int = 9,
    n_agent_kps: int = 3,
    seed: int = 0,
    jitter: float = 1.0,
) -> dict[str, np.ndarray]:
    """{'block': (9, 2), 'agent': (3, 2)} local keypoints — the
    ``genenerate_keypoint_manager_params`` analogue
    (pusht_keypoints_env.py:72-77, incl. small sampling jitter)."""
    rng = np.random.default_rng(seed)
    block = farthest_point_sampling(_dense_block_points(params), n_block_kps,
                                    init_idx=0)
    agent = farthest_point_sampling(_dense_agent_points(params), n_agent_kps,
                                    init_idx=0)
    if jitter:
        block = block + rng.normal(0, jitter, block.shape)
        agent = agent + rng.normal(0, jitter, agent.shape)
    return {"block": block.astype(np.float32),
            "agent": agent.astype(np.float32)}


def keypoints_global(local_kps: jnp.ndarray, pos: jnp.ndarray,
                     angle: jnp.ndarray) -> jnp.ndarray:
    """Local (N, 2) keypoints → world, via the body pose (the
    ``get_keypoints_global`` equivalent, pymunk_keypoint_manager.py:93-117)."""
    R = rot2d(angle)
    return pos[None, :] + local_kps @ R.T
