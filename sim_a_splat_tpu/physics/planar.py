"""Pure-JAX planar rigid-body primitives.

TPU-native replacement for pymunk/Chipmunk2D (reference pusht_env.py:331-440,
native component N7 in SURVEY.md §2.3).  Chipmunk is a C library with dynamic
contact lists and a sequential-impulse solver; here every piece is
fixed-shape, branch-free jnp so the whole physics step jits, vmaps over
thousands of envs, and differentiates:

- ``moment_for_poly`` — Chipmunk's ``cpMomentForPoly`` formula verbatim
  (the reference relies on its exact value, pusht_env.py:404-425, including
  the quirk that both T-block shapes use the *first* shape's vertex list).
- circle-vs-convex-polygon and vertex-vs-halfplane contact generation into
  fixed contact slots (active flags instead of variable-length lists).
- a projected Gauss-Seidel impulse solver with Coulomb friction and
  split-impulse (pseudo-velocity) penetration correction, matching
  Chipmunk's solver structure: real velocities are never polluted by
  position correction.
- ``convex_clip_area`` — Sutherland-Hodgman clipping with fixed 8-slot
  buffers + shoelace area: the shapely polygon-intersection reward
  (pusht_env.py:150-157) as a differentiable jnp function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


def moment_for_poly(mass: float, verts) -> float:
    """Chipmunk ``cpMomentForPoly`` about the body origin (host-side float).

    The reference builds the T-block inertia as ``moment_for_poly(1, verts1)
    * 2`` in effect (pusht_env.py:409-417) and hands it to the body as the
    about-CoG moment without the parallel-axis correction — we reproduce
    that exactly for dynamic parity.
    """
    import numpy as np

    v = np.asarray(verts, np.float64)
    s1 = 0.0
    s2 = 0.0
    n = len(v)
    for i in range(n):
        v1, v2 = v[i], v[(i + 1) % n]
        a = float(v2[0] * v1[1] - v2[1] * v1[0])
        b = float(v1 @ v1 + v1 @ v2 + v2 @ v2)
        s1 += a * b
        s2 += a
    return mass * s1 / (6.0 * s2)


def rot2d(angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def cross2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """z-component of the 2D cross product (..., 2) × (..., 2) → (...)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def perp(v: jnp.ndarray) -> jnp.ndarray:
    """90° counter-clockwise rotation."""
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


class Contact(NamedTuple):
    """One fixed contact slot (batch-friendly struct-of-arrays)."""

    point: jnp.ndarray     # (..., 2) world contact point
    normal: jnp.ndarray    # (..., 2) impulse direction on the dynamic body
    depth: jnp.ndarray     # (...,)  penetration depth (>0 ⇒ touching)
    active: jnp.ndarray    # (...,)  bool
    friction: jnp.ndarray  # (...,)  Coulomb coefficient for this pair
    other_vel: jnp.ndarray  # (..., 2) velocity of the other (non-dynamic) body


def circle_poly_contact(
    center: jnp.ndarray,
    radius: float,
    poly: jnp.ndarray,
    other_vel: jnp.ndarray,
    friction: float,
) -> Contact:
    """Deepest contact between a circle and a convex polygon (CCW winding
    ⇒ outward normals).  Normal points poly → circle, i.e. the impulse
    direction on the *circle*; the caller flips it when the polygon is the
    dynamic body."""
    v0 = poly
    v1 = jnp.roll(poly, -1, axis=0)
    edges = v1 - v0
    # outward normal of a CCW polygon edge
    n = -perp(edges)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    d = jnp.sum(n * (center[None, :] - v0), axis=-1)        # signed face dists
    dmax = jnp.max(d)
    iface = jnp.argmax(d)

    # closest point on the boundary (needed when the center is outside)
    t = jnp.clip(
        jnp.sum((center[None, :] - v0) * edges, axis=-1)
        / jnp.maximum(jnp.sum(edges * edges, axis=-1), 1e-9),
        0.0, 1.0,
    )
    cp = v0 + t[:, None] * edges
    dist = jnp.linalg.norm(center[None, :] - cp, axis=-1)
    iedge = jnp.argmin(dist)

    inside = dmax < 0.0
    normal_out = (center - cp[iedge]) / jnp.maximum(dist[iedge], 1e-9)
    normal = jnp.where(inside, n[iface], normal_out)
    depth = jnp.where(inside, radius - dmax, radius - dist[iedge])
    point = center - normal * (radius - depth * 0.5)
    return Contact(
        point=point,
        normal=normal,
        depth=depth,
        active=depth > 0.0,
        friction=jnp.asarray(friction, center.dtype),
        other_vel=other_vel,
    )


class PlanarBody(NamedTuple):
    """Dynamic rigid body state: CoG position, angle, CoG/angular velocity."""

    cog: jnp.ndarray       # (2,)
    angle: jnp.ndarray     # ()
    vel: jnp.ndarray       # (2,)
    omega: jnp.ndarray     # ()


def solve_contacts(
    body: PlanarBody,
    contacts: Contact,
    inv_mass: float,
    inv_inertia: float,
    dt: float,
    iterations: int = 10,
    bias: float = 0.2,
    slop: float = 0.1,
):
    """Projected Gauss-Seidel over fixed contact slots.

    Returns the post-solve (vel, omega) and the pseudo-velocities
    (bias_vel, bias_omega) that integrate into position only — Chipmunk's
    split-impulse scheme, so penetration correction adds no kinetic energy
    (critical with the pushT damping-0 convention where real velocities are
    the only state the block carries through a substep).
    """
    C = contacts.normal.shape[0]
    tangents = perp(contacts.normal)
    r = contacts.point - body.cog[None, :]

    rxn = cross2(r, contacts.normal)
    rxt = cross2(r, tangents)
    k_n = inv_mass + inv_inertia * rxn * rxn
    k_t = inv_mass + inv_inertia * rxt * rxt
    inv_k_n = jnp.where(contacts.active, 1.0 / k_n, 0.0)
    inv_k_t = jnp.where(contacts.active, 1.0 / k_t, 0.0)
    bias_target = (bias / dt) * jnp.maximum(contacts.depth - slop, 0.0)

    def body_vel_at(v, w, i):
        return v + w * perp(r[i])

    def iteration(_, state):
        v, w, vb, wb, jn, jt, jb = state
        for i in range(C):  # unrolled: C is a small static count
            n_i = contacts.normal[i]
            t_i = tangents[i]
            # --- normal impulse (real velocity)
            rel = jnp.dot(n_i, body_vel_at(v, w, i) - contacts.other_vel[i])
            dj = -rel * inv_k_n[i]
            jn_new = jnp.maximum(jn[i] + dj, 0.0)
            dj = jn_new - jn[i]
            jn = jn.at[i].set(jn_new)
            v = v + dj * inv_mass * n_i
            w = w + dj * inv_inertia * rxn[i]
            # --- friction impulse, clamped by μ·jn
            relt = jnp.dot(t_i, body_vel_at(v, w, i) - contacts.other_vel[i])
            djt = -relt * inv_k_t[i]
            lim = contacts.friction[i] * jn[i]
            jt_new = jnp.clip(jt[i] + djt, -lim, lim)
            djt = jt_new - jt[i]
            jt = jt.at[i].set(jt_new)
            v = v + djt * inv_mass * t_i
            w = w + djt * inv_inertia * rxt[i]
            # --- bias impulse (pseudo velocity, position correction only)
            relb = jnp.dot(n_i, vb + wb * perp(r[i]))
            djb = (bias_target[i] - relb) * inv_k_n[i]
            jb_new = jnp.maximum(jb[i] + djb, 0.0)
            djb = jb_new - jb[i]
            jb = jb.at[i].set(jb_new)
            vb = vb + djb * inv_mass * n_i
            wb = wb + djb * inv_inertia * rxn[i]
        return v, w, vb, wb, jn, jt, jb

    zeros = jnp.zeros((C,), body.vel.dtype)
    v, w, vb, wb, jn, jt, _ = lax.fori_loop(
        0, iterations, iteration,
        (body.vel, body.omega, jnp.zeros_like(body.vel),
         jnp.zeros_like(body.omega), zeros, zeros, zeros),
    )
    return v, w, vb, wb, jn


# ---------------------------------------------------------------------------
# Convex polygon intersection area (the shapely-reward replacement)
# ---------------------------------------------------------------------------

_CLIP_SLOTS = 8  # quad clipped by quad never exceeds 8 vertices


def _clip_halfplane(pts, count, a, b):
    """Keep the part of polygon (pts, count) left of directed edge a→b."""
    nmax = pts.shape[0]
    idx = jnp.arange(nmax)
    prev_idx = jnp.mod(idx - 1, jnp.maximum(count, 1))
    cur = pts
    prv = pts[prev_idx]
    e = b - a
    side_cur = cross2(e, cur - a) >= 0.0
    side_prv = cross2(e, prv - a) >= 0.0
    in_range = idx < count

    # segment-plane intersection point
    dc = cross2(e, cur - a)
    dp = cross2(e, prv - a)
    t = dp / jnp.where(jnp.abs(dp - dc) < 1e-12, 1e-12, dp - dc)
    inter = prv + t[:, None] * (cur - prv)

    emit_inter = in_range & (side_cur != side_prv)
    emit_cur = in_range & side_cur

    # interleave (intersection, current) per input vertex, then compact
    flags = jnp.stack([emit_inter, emit_cur], -1).reshape(-1)      # (2n,)
    points = jnp.stack([inter, cur], -2).reshape(-1, 2)            # (2n, 2)
    pos = jnp.cumsum(flags) - 1
    target = jnp.where(flags, pos, nmax)                           # drop slot
    out = jnp.zeros((nmax, 2), pts.dtype).at[target].set(points, mode="drop")
    return out, jnp.sum(flags)


def _shoelace(pts, count):
    nmax = pts.shape[0]
    idx = jnp.arange(nmax)
    nxt = pts[jnp.mod(idx + 1, jnp.maximum(count, 1))]
    contrib = jnp.where(idx < count, cross2(pts, nxt), 0.0)
    return 0.5 * jnp.sum(contrib)


def convex_clip_area(poly: jnp.ndarray, clip: jnp.ndarray) -> jnp.ndarray:
    """Area of the intersection of two convex CCW quads (differentiable).

    Replaces ``shapely`` ``goal_geom.intersection(block_geom).area``
    (reference pusht_env.py:150-155) with fixed-shape Sutherland-Hodgman
    clipping — jit/vmap/grad-safe.
    """
    pts = jnp.zeros((_CLIP_SLOTS, 2), poly.dtype).at[:4].set(poly)
    count = jnp.asarray(4)
    for i in range(4):
        pts, count = _clip_halfplane(pts, count, clip[i], clip[(i + 1) % 4])
    return jnp.abs(_shoelace(pts, count))
