"""Analytic 2D rasterizer for pushT debug/image observations.

TPU-native replacement for the pygame/SDL render path (reference
pusht_env.py:213-270, native component N11): instead of drawing on an SDL
surface and cv2-resizing 298×512 → 96×96, every output pixel is mapped to
workspace coordinates and classified against the scene's shape masks
(signed-distance tests) — one fused elementwise pass, jit/vmap-friendly,
no host round-trip.

Layer order and palette follow the reference draw order (white canvas →
goal T → walls → agent → block, colors from pusht_env.py:360, :381-389,
pymunk_override.py).  The action marker reproduces the reference's
``coord = action/512*96`` mapping verbatim — including dividing *both*
axes by 512 (pusht_env.py:258-259).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sim_a_splat_tpu.physics import pusht
from sim_a_splat_tpu.physics.pusht import PushTParams, PushTState
from sim_a_splat_tpu.physics.planar import rot2d

# reference palette (pygame color names)
COL_BG = (255, 255, 255)
COL_WALL = (211, 211, 211)        # LightGray
COL_GOAL = (144, 238, 144)        # LightGreen
COL_AGENT = (65, 105, 225)        # RoyalBlue
COL_BLOCK = (119, 136, 153)       # LightSlateGray
COL_MARKER = (255, 0, 0)


def _point_in_box(pts, center_poly):
    """(..., 2) pts inside a convex quad (CCW): all edge cross products ≥ 0."""
    v0 = center_poly
    v1 = jnp.roll(center_poly, -1, axis=0)
    e = v1 - v0                                        # (4, 2)
    d = pts[..., None, :] - v0                         # (..., 4, 2)
    cross = e[..., 0] * d[..., 1] - e[..., 1] * d[..., 0]
    return jnp.all(cross >= 0.0, axis=-1)


def render_frame(
    params: PushTParams,
    state: PushTState,
    render_size: int = 96,
    action: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(render_size, render_size, 3) float RGB in [0, 1]."""
    rs = render_size
    # output pixel centers → workspace coords (the reference squashes the
    # full 298×512 canvas into a square, pusht_env.py:255)
    u = (jnp.arange(rs, dtype=dtype) + 0.5) / rs
    wx = u * params.ws_x
    wy = u * params.ws_y
    X, Y = jnp.meshgrid(wx, wy)                        # (rs, rs): row=y
    P = jnp.stack([X, Y], axis=-1)

    img = jnp.ones((rs, rs, 3), dtype) * jnp.asarray(COL_BG, dtype) / 255.0

    def paint(img, mask, color):
        c = jnp.asarray(color, dtype) / 255.0
        return jnp.where(mask[..., None], c, img)

    # goal T
    goal_polys = pusht.block_polys_world(
        params,
        jnp.asarray([params.goal_x, params.goal_y], dtype),
        jnp.asarray(params.goal_theta, dtype),
    )
    goal_mask = _point_in_box(P, goal_polys[0]) | _point_in_box(P, goal_polys[1])
    img = paint(img, goal_mask, COL_GOAL)

    # walls: fat segments at inset 5, radius 2 (pusht_env.py:339-353)
    m = params.wall_inset
    r = params.wall_radius
    wall_mask = (
        (jnp.abs(X - m) <= r) | (jnp.abs(X - (params.ws_x - m)) <= r)
        | (jnp.abs(Y - m) <= r) | (jnp.abs(Y - (params.ws_y - m)) <= r)
    )
    # restrict to the wall rectangle outline span
    span = (X >= m - r) & (X <= params.ws_x - m + r) & \
           (Y >= m - r) & (Y <= params.ws_y - m + r)
    img = paint(img, wall_mask & span, COL_WALL)

    # agent circle
    agent_mask = jnp.linalg.norm(P - state.agent_pos, axis=-1) <= params.agent_radius
    img = paint(img, agent_mask, COL_AGENT)

    # block T (drawn last — on top, matching space insertion order)
    polys = pusht.block_polys_world(params, state.block_pos, state.block_angle)
    block_mask = _point_in_box(P, polys[0]) | _point_in_box(P, polys[1])
    img = paint(img, block_mask, COL_BLOCK)

    if action is not None:
        # reference marker quirk: both axes scaled by 512 (pusht_env.py:258)
        coord = jnp.asarray(action, dtype) / 512.0 * 96.0 * (rs / 96.0)
        msz = (8.0 / 96.0 * rs) / 2.0
        th = jnp.maximum(jnp.floor(1.0 / 96.0 * rs), 1.0) / 2.0
        pix = jnp.stack(jnp.meshgrid(jnp.arange(rs, dtype=dtype),
                                     jnp.arange(rs, dtype=dtype)), -1)[..., ::-1]
        d = pix - coord                                # (rs, rs, 2) [dx, dy]
        dx, dy = jnp.abs(d[..., 1]), jnp.abs(d[..., 0])
        cross = ((dx <= th) | (dy <= th)) & (dx <= msz) & (dy <= msz)
        img = paint(img, cross, COL_MARKER)
    return img


def keypoint_overlay(
    img: jnp.ndarray,
    keypoints: jnp.ndarray,
    visible: jnp.ndarray,
    params: PushTParams,
    color=(31, 119, 180),
    radius: float | None = None,
) -> jnp.ndarray:
    """Draw visible keypoints (workspace coords) as dots — the
    ``draw_keypoints`` equivalent (pymunk_keypoint_manager.py:119-130)."""
    rs = img.shape[0]
    if radius is None:
        radius = rs / 96.0
    u = (jnp.arange(rs, dtype=img.dtype) + 0.5) / rs
    X, Y = jnp.meshgrid(u * params.ws_x, u * params.ws_y)
    P = jnp.stack([X, Y], -1)
    # workspace→pixel is anisotropic; compare in pixel space
    scale = jnp.asarray([rs / params.ws_x, rs / params.ws_y], img.dtype)
    d = (P[:, :, None, :] - keypoints[None, None, :, :]) * scale
    hit = (jnp.linalg.norm(d, axis=-1) <= radius) & visible[None, None, :]
    mask = jnp.any(hit, axis=-1)
    c = jnp.asarray(color, img.dtype) / 255.0
    return jnp.where(mask[..., None], c, img)
