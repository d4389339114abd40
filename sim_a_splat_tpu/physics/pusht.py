"""Pure-JAX pushT task physics — functional twin of the reference's
pymunk-based ``PushTEnv`` dynamics (sim_a_splat/env/pusht/pusht_env.py).

Reference semantics reproduced (constants at pusht_env.py:44-50, :331-440):

- 298×512 workspace, walls inset 5 px with radius 2
- kinematic circle agent r=17 with velocity-level PD
  (kp=100, kv=20): ``v += (kp(a−x) − kv·v)·dt`` each 100 Hz substep
  (pusht_env.py:139-145)
- dynamic T-block: two boxes (scale 30, length 4), mass 1, Chipmunk moment
  quirk included (both shapes use the first shape's vertex list,
  pusht_env.py:404-425), CoG at the mean of the two box centroids
- ``space.damping = 0`` ⇒ the block carries **no** velocity between
  substeps (quasi-static pushing); contacts are inelastic, friction 1
  between agent and block, 0 against walls (walls never set friction)
- reward = clip(coverage/0.95, 0, 1) with coverage = |block ∩ goal| / |goal|
  by exact convex clipping (pusht_env.py:147-158), done at coverage > 0.95
- 10 substeps per control step (sim_hz=100, control_hz=10)

Everything is a pure function over :class:`PushTState` — `jit`-able,
`vmap`-able over envs, differentiable through dynamics and reward.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sim_a_splat_tpu.physics.planar import (
    Contact, PlanarBody, circle_poly_contact, convex_clip_area,
    moment_for_poly, perp, rot2d, solve_contacts,
)


@dataclasses.dataclass(frozen=True)
class PushTParams:
    """Static task parameters (hashable ⇒ jit constants)."""

    ws_x: float = 298.0
    ws_y: float = 512.0
    sim_hz: int = 100
    control_hz: int = 10
    k_p: float = 100.0
    k_v: float = 20.0
    agent_radius: float = 17.0
    wall_inset: float = 5.0
    wall_radius: float = 2.0
    scale: float = 30.0
    length: float = 4.0
    mass: float = 1.0
    # Contact friction.  The reference sets ``body.friction = 1``
    # (pusht_env.py:383, :436) but pymunk friction lives on *shapes*
    # (Chipmunk ``cpShape->u``, combined as u_a·u_b) and the shapes are never
    # touched — so every contact in the reference is actually frictionless.
    # 0.0 reproduces that; set >0 to model sticky pushing.
    friction: float = 0.0
    damping: float = 0.0          # pymunk space.damping (0 in the reference)
    goal_x: float = 149.0         # ws_x / 2
    goal_y: float = 256.0         # ws_y / 2
    goal_theta: float = float(np.pi / 4)
    success_threshold: float = 0.95
    solver_iters: int = 10
    # Penetration-correction coefficient.  None -> Chipmunk's default
    # schedule: biasCoef(dt) = 1 - collisionBias**dt with
    # collisionBias = (1-0.1)**60 ("fix 10% of overlap per 1/60 s"),
    # i.e. ~0.0613 at dt = 0.01 (cpSpaceStep semantics).
    bias: float | None = None
    slop: float = 0.1
    # Optional body-local CoG override (pusht_env.py:97-99 sets
    # ``body.center_of_gravity``; Chipmunk keeps the explicitly-set moment,
    # only the pivot point moves).  None -> shape-derived CoG.
    block_cog: tuple | None = None

    @property
    def dt(self) -> float:
        return 1.0 / self.sim_hz

    @property
    def bias_coef(self) -> float:
        if self.bias is not None:
            return self.bias
        return 1.0 - (1.0 - 0.1) ** (60.0 * self.dt)

    @property
    def substeps(self) -> int:
        return self.sim_hz // self.control_hz

    @property
    def goal_pose(self) -> np.ndarray:
        return np.array([self.goal_x, self.goal_y, self.goal_theta])


class PushTState(NamedTuple):
    """Dynamic state (all jnp; leading batch dims allowed via vmap)."""

    agent_pos: jnp.ndarray    # (2,)
    agent_vel: jnp.ndarray    # (2,)
    block_pos: jnp.ndarray    # (2,) body-origin position (pymunk convention)
    block_angle: jnp.ndarray  # ()
    block_vel: jnp.ndarray    # (2,) CoG velocity
    block_omega: jnp.ndarray  # ()
    n_contacts: jnp.ndarray   # () accumulated agent-block contact count


# --- geometry ---------------------------------------------------------------

def tee_polys_local(scale: float = 30.0, length: float = 4.0) -> np.ndarray:
    """(2, 4, 2) CCW local vertices of the two T-block boxes.

    Same boxes as pusht_env.py:404-417 (there in screen-CW order; reversed
    here so outward normals follow the CCW convention of planar.py).
    """
    v1 = [(-length * scale / 2, scale), (length * scale / 2, scale),
          (length * scale / 2, 0), (-length * scale / 2, 0)]
    v2 = [(-scale / 2, scale), (-scale / 2, length * scale),
          (scale / 2, length * scale), (scale / 2, scale)]
    return np.asarray([v1[::-1], v2[::-1]], np.float32)


def tee_cog_local(scale: float = 30.0, length: float = 4.0) -> np.ndarray:
    """CoG = mean of the two box centroids (pusht_env.py:426-428)."""
    polys = tee_polys_local(scale, length)
    return polys.mean(axis=1).mean(axis=0)  # box centroid = vertex mean


def cog_local(params: PushTParams) -> np.ndarray:
    """Body-local CoG: the ``block_cog`` override if set (pusht_env.py:97-99),
    else the shape-derived default."""
    if params.block_cog is not None:
        return np.asarray(params.block_cog, np.float32)
    return tee_cog_local(params.scale, params.length)


def tee_inertia(params: PushTParams) -> float:
    """mass=1, I = moment(verts1) + moment(verts1) — reference quirk
    (pusht_env.py:409-417 computes ``inertia2`` from ``vertices1``)."""
    v1 = tee_polys_local(params.scale, params.length)[0]
    return 2.0 * moment_for_poly(params.mass, v1)


def block_polys_world(params: PushTParams, pos, angle) -> jnp.ndarray:
    """(2, 4, 2) world vertices at body-origin ``pos`` / ``angle``."""
    local = jnp.asarray(tee_polys_local(params.scale, params.length))
    R = rot2d(angle)
    return pos[None, None, :] + jnp.einsum("ij,pvj->pvi", R, local)


def block_cog_world(params: PushTParams, pos, angle) -> jnp.ndarray:
    cog = jnp.asarray(cog_local(params))
    return pos + rot2d(angle) @ cog


def _origin_from_cog(params: PushTParams, cog, angle) -> jnp.ndarray:
    c = jnp.asarray(cog_local(params))
    return cog - rot2d(angle) @ c


# --- contacts ---------------------------------------------------------------

def _wall_planes(params: PushTParams) -> tuple[np.ndarray, np.ndarray]:
    """Inner contact planes of the 4 walls: n·p ≥ b, normals point into the
    arena (walls at inset 5 with segment radius 2 ⇒ surfaces at 7 px,
    pusht_env.py:339-353)."""
    m = params.wall_inset + params.wall_radius
    n = np.asarray([[1, 0], [0, 1], [-1, 0], [0, -1]], np.float32)
    b = np.asarray([m, m, -(params.ws_x - m), -(params.ws_y - m)], np.float32)
    return n, b


def _gather_contacts(params: PushTParams, state: PushTState) -> Contact:
    """Fixed 10-slot contact set: 2 agent-block + 4 walls × 2 deepest verts."""
    polys = block_polys_world(params, state.block_pos, state.block_angle)

    # agent circle vs each block box — impulse direction on the block is the
    # *negated* poly→circle normal
    ag = [
        circle_poly_contact(state.agent_pos, params.agent_radius, polys[i],
                            state.agent_vel, params.friction)
        for i in range(2)
    ]
    agent_c = jax.tree.map(lambda *x: jnp.stack(x), *ag)
    agent_c = agent_c._replace(normal=-agent_c.normal)

    # block verts vs wall planes (frictionless: the walls never set friction
    # and Chipmunk multiplies the pair's coefficients)
    nw, bw = _wall_planes(params)
    nw = jnp.asarray(nw)
    bw = jnp.asarray(bw)
    verts = polys.reshape(-1, 2)                          # (8, 2)
    pen = bw[:, None] - nw.astype(verts.dtype) @ verts.T  # (4 walls, 8)
    top_pen, top_idx = lax.top_k(pen, 2)                  # (4, 2)
    wall_pts = verts[top_idx]                             # (4, 2, 2)
    wall_c = Contact(
        point=wall_pts.reshape(-1, 2),
        normal=jnp.broadcast_to(nw[:, None, :], (4, 2, 2)).reshape(-1, 2),
        depth=top_pen.reshape(-1),
        active=(top_pen > 0.0).reshape(-1),
        friction=jnp.zeros(8, verts.dtype),
        other_vel=jnp.zeros((8, 2), verts.dtype),
    )
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b]), agent_c, wall_c)


# --- stepping ---------------------------------------------------------------

def substep(params: PushTParams, state: PushTState,
            action: jnp.ndarray | None) -> PushTState:
    """One 100 Hz physics substep (PD control + Chipmunk-ordered step:
    damp velocities → solve impulses → integrate positions)."""
    dt = params.dt
    agent_vel = state.agent_vel
    if action is not None:
        acc = params.k_p * (action - state.agent_pos) + params.k_v * (-agent_vel)
        agent_vel = agent_vel + acc * dt

    damp = params.damping ** dt if params.damping > 0 else 0.0
    cog = block_cog_world(params, state.block_pos, state.block_angle)
    body = PlanarBody(
        cog=cog,
        angle=state.block_angle,
        vel=state.block_vel * damp,
        omega=state.block_omega * damp,
    )

    contacts = _gather_contacts(
        params, state._replace(agent_vel=agent_vel))
    inv_m = 1.0 / params.mass
    inv_i = 1.0 / tee_inertia(params)
    v, w, vb, wb, jn = solve_contacts(
        body, contacts, inv_m, inv_i, dt,
        iterations=params.solver_iters, bias=params.bias_coef,
        slop=params.slop)

    new_cog = body.cog + (v + vb) * dt
    new_angle = body.angle + (w + wb) * dt
    return PushTState(
        agent_pos=state.agent_pos + agent_vel * dt,
        agent_vel=agent_vel,
        block_pos=_origin_from_cog(params, new_cog, new_angle),
        block_angle=new_angle,
        block_vel=v,
        block_omega=w,
        n_contacts=state.n_contacts + jnp.sum(contacts.active[:2]),
    )


def control_step(params: PushTParams, state: PushTState,
                 action: jnp.ndarray) -> PushTState:
    """One 10 Hz control step = ``sim_hz/control_hz`` scanned substeps
    (pusht_env.py:132-148)."""
    state = state._replace(n_contacts=jnp.zeros_like(state.n_contacts))

    def body(s, _):
        return substep(params, s, action), None

    state, _ = lax.scan(body, state, None, length=params.substeps)
    return state


# --- reward / observation ---------------------------------------------------

def coverage(params: PushTParams, state: PushTState) -> jnp.ndarray:
    """|block ∩ goal| / |goal| via exact convex clipping.  The two T boxes
    have disjoint interiors, so the union-intersection area is the sum of
    the four pairwise box intersections."""
    block = block_polys_world(params, state.block_pos, state.block_angle)
    goal = block_polys_world(
        params,
        jnp.asarray([params.goal_x, params.goal_y], block.dtype),
        jnp.asarray(params.goal_theta, block.dtype),
    )
    inter = sum(
        convex_clip_area(block[i], goal[j]) for i in range(2) for j in range(2)
    )
    goal_area = sum(
        jnp.abs(convex_clip_area(goal[j], goal[j])) for j in range(2)
    )
    return inter / goal_area


def reward_done(params: PushTParams, state: PushTState):
    cov = coverage(params, state)
    reward = jnp.clip(cov / params.success_threshold, 0.0, 1.0)
    done = cov > params.success_threshold
    return reward, done


def get_obs(state: PushTState) -> jnp.ndarray:
    """[agent_xy, block_xy, block_angle mod 2π] (pusht_env.py:183-189)."""
    return jnp.concatenate([
        state.agent_pos,
        state.block_pos,
        jnp.mod(state.block_angle, 2.0 * jnp.pi)[None],
    ])


# --- reset / set-state -------------------------------------------------------

def set_state(params: PushTParams, state_vec: jnp.ndarray,
              legacy: bool = False) -> PushTState:
    """Reset to [agent_x, agent_y, block_x, block_y, block_angle].

    Mirrors ``_set_state`` (pusht_env.py:287-310) including the legacy
    ordering quirk: legacy data set position *before* angle, and pymunk
    rotates about the CoG, displacing the body origin.  After placement one
    velocity-free substep runs (the reference's settling
    ``space.step``, :309-310).
    """
    agent_pos = state_vec[:2]
    block_pos = state_vec[2:4]
    angle = state_vec[4]
    if legacy:
        cog0 = block_pos + rot2d(jnp.zeros_like(angle)) @ jnp.asarray(
            cog_local(params))
        block_pos = _origin_from_cog(params, cog0, angle)
    zero2 = jnp.zeros_like(agent_pos)
    state = PushTState(
        agent_pos=agent_pos,
        agent_vel=zero2,
        block_pos=block_pos,
        block_angle=angle,
        block_vel=zero2,
        block_omega=jnp.zeros_like(angle),
        n_contacts=jnp.zeros_like(angle),
    )
    return substep(params, state, None)


def sample_reset_state(params: PushTParams, key: jax.Array) -> jnp.ndarray:
    """Random reset distribution of the reference (pusht_env.py:102-115):
    integer-grid agent/block positions, angle = 2π·N(0,1) − π."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    f = jnp.float32
    return jnp.stack([
        jax.random.randint(k1, (), 50, int(params.ws_x) - 50).astype(f),
        jax.random.randint(k2, (), 50, int(params.ws_y) - 50).astype(f),
        jax.random.randint(k3, (), 100, int(params.ws_x) - 100).astype(f),
        jax.random.randint(k4, (), 100, int(params.ws_y) - 100).astype(f),
        jax.random.normal(k5, (), f) * 2.0 * jnp.pi - jnp.pi,
    ])


def reset(params: PushTParams, key: jax.Array,
          reset_to_state: jnp.ndarray | None = None,
          legacy: bool = False) -> PushTState:
    vec = sample_reset_state(params, key) if reset_to_state is None else reset_to_state
    return set_state(params, jnp.asarray(vec, jnp.float32), legacy=legacy)
