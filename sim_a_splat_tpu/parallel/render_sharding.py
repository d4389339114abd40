"""Primitive/tile-sharded rendering across the device mesh.

For scenes too large for one chip the renderer itself is parallelized
(SURVEY.md §5 "long-context" analogue): gaussians are sharded over the
``prim`` mesh axis, each device projects and bins its shard against **all**
image tiles, and one ``all_to_all`` routes per-tile candidate lists to the
tile's owner device — the rasterizer's equivalent of Ulysses-style head
exchange.  The owner merges the D depth-sorted sublists (one sort), then
composites its tile rows with the same kernel as the single-device path
(ops/rasterize_tiles.composite_tiles).

Everything is fixed-shape: each device sends exactly ``send_capacity``
candidates per tile, so the collective payload is
``T × send_capacity × 10`` floats regardless of scene content; overflow is
truncation of the farthest gaussians per (device, tile), reported via the
returned counts.  Differentiable end-to-end (``all_to_all`` transposes to
``all_to_all``).
"""

from __future__ import annotations


from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from sim_a_splat_tpu.ops.projection import Camera, project, view_directions
from sim_a_splat_tpu.ops import sh as sh_ops
from sim_a_splat_tpu.ops.rasterize_tiles import (
    RasterConfig, composite_tiles, gather_tile_lists, untile_image,
)
from sim_a_splat_tpu.parallel.mesh import PRIM_AXIS


def pad_gaussians(arrs: dict, n_pad: int) -> dict:
    """Pad gaussian arrays to a shard-divisible count with gaussians that
    project invalid (z far behind the near plane)."""
    out = {}
    for k, a in arrs.items():
        pad_width = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
        if k == "means":
            pad = jnp.zeros((n_pad, 3), a.dtype).at[:, 2].set(-1e6)
            out[k] = jnp.concatenate([a, pad])
        else:
            out[k] = jnp.pad(a, pad_width)
    return out


def rasterize_sharded(
    mesh: Mesh,
    means: jnp.ndarray,
    covs: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    camera: Camera,
    config: RasterConfig = RasterConfig(),
    send_capacity: int = 64,
    background: jnp.ndarray | None = None,
):
    """Multi-device render of one scene → (H, W, 3) (replicated output).

    ``means/covs/colors/opacities`` may live anywhere; they are resharded
    over the ``prim`` axis.  ``send_capacity`` bounds per-device per-tile
    contributions before the exchange (their *merged* count is bounded by
    ``config.tile_capacity``).
    """
    D = mesh.shape[PRIM_AXIS]
    ts = config.tile_size
    H, W = camera.height, camera.width
    tx = -(-W // ts)
    ty = -(-H // ts)
    T = tx * ty
    T_pad = -(-T // D) * D

    n = means.shape[0]
    n_pad = (-n) % D
    if n_pad:
        p = pad_gaussians(
            {"means": means, "covs": covs, "colors": colors,
             "opacities": opacities}, n_pad)
        means, covs = p["means"], p["covs"]
        colors, opacities = p["colors"], p["opacities"]

    send_cfg = config._replace(tile_capacity=send_capacity)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PRIM_AXIS), P(PRIM_AXIS), P(PRIM_AXIS), P(PRIM_AXIS)),
        out_specs=P(None, PRIM_AXIS),
    )
    def inner(means_l, covs_l, colors_l, opac_l):
        # 1. project + bin the local gaussian shard against all tiles
        proj_l = project(means_l, covs_l, camera)
        (gxy, gconic, gcol, gop, gdepth), counts_l, _ = gather_tile_lists(
            proj_l, colors_l, opac_l, send_cfg, tx, ty)
        depth_key = jnp.where(gop > 0.0, gdepth, jnp.inf)

        def pad_tiles(a):
            return jnp.pad(a, [(0, T_pad - T)] + [(0, 0)] * (a.ndim - 1))

        payload = [pad_tiles(a) for a in
                   (gxy[..., 0], gxy[..., 1], gconic[..., 0], gconic[..., 1],
                    gconic[..., 2], gcol[..., 0], gcol[..., 1], gcol[..., 2],
                    gop, gdepth, depth_key)]

        # 2. route candidates to tile owners: (T_pad, Ks) → (D, T_pad/D, Ks)
        def exchange(a):
            a = a.reshape((D, T_pad // D) + a.shape[1:])
            return lax.all_to_all(a, PRIM_AXIS, split_axis=0, concat_axis=0,
                                  tiled=False)

        recv = [exchange(a) for a in payload]              # (D, T/D, Ks)

        # 3. merge the D sorted sublists per owned tile: one sort by depth
        def flat(a):
            return jnp.moveaxis(a, 0, 1).reshape(T_pad // D, D * send_capacity)

        merged = lax.sort([flat(recv[-1])] + [flat(a) for a in recv[:-1]],
                          dimension=1, num_keys=1)
        (_, mx, my, mca, mcb, mcc, mr, mg, mb, mop, mdep) = merged

        K = min(config.tile_capacity, D * send_capacity)
        sel = slice(0, K)
        gxy_m = jnp.stack([mx[:, sel], my[:, sel]], axis=-1)
        gconic_m = jnp.stack([mca[:, sel], mcb[:, sel], mcc[:, sel]], axis=-1)
        gcol_m = jnp.stack([mr[:, sel], mg[:, sel], mb[:, sel]], axis=-1)
        gop_m = mop[:, sel]
        gdep_m = mdep[:, sel]

        # 4. composite owned tile rows
        d_idx = lax.axis_index(PRIM_AXIS)
        tile_ids = d_idx * (T_pad // D) + jnp.arange(T_pad // D,
                                                    dtype=jnp.int32)
        rgb, depth_acc, trans = composite_tiles(
            gxy_m, gconic_m, gcol_m, gop_m, gdep_m, tile_ids, config, tx)
        return jnp.moveaxis(jnp.concatenate(
            [rgb, depth_acc[..., None], trans[..., None]], axis=-1), 0, 1)

    packed = inner(means, covs, colors, opacities)         # (P, T_pad, 5)
    packed = jnp.moveaxis(packed, 1, 0)[:T]                # (T, P, 5)
    rgb, trans = packed[..., :3], packed[..., 4]
    if background is None:
        background = jnp.zeros(3, dtype=rgb.dtype)
    rgb = rgb + trans[..., None] * background
    img = untile_image(rgb, tx, ty, ts, H, W)
    return img


def rasterize_sharded_sh(mesh, means, covs, sh_coeffs, opacities, camera,
                         sh_degree: int, config: RasterConfig = RasterConfig(),
                         send_capacity: int = 64, background=None):
    dirs = view_directions(means, camera)
    colors = sh_ops.eval_sh_color(sh_coeffs, dirs, sh_degree)
    return rasterize_sharded(mesh, means, covs, colors, opacities, camera,
                             config, send_capacity, background)
