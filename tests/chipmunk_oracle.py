"""Independent numpy re-implementation of Chipmunk2D's stepping algorithm,
used as trajectory ground truth for the pushT task.

Why this exists: SURVEY.md §7 requires "verify task dynamics against pymunk
trajectories within tolerance", but pymunk (a C-extension binding of
Chipmunk2D) is not installed and cannot be installed in this environment
(no network egress).  This module is a from-scratch, mutable, object-style
re-implementation of the algorithm Chipmunk documents and implements in
``cpSpace.c`` / ``cpArbiter.c`` / ``cpBody.c`` — deliberately structured
unlike the fixed-shape JAX solver in ``sim_a_splat_tpu/physics/planar.py``
(per-arbiter objects with cached impulses and warm starting, Chipmunk's
step ordering, per-shape-pair contact generation) so agreement between the
two is meaningful cross-validation rather than self-comparison.

Chipmunk semantics reproduced:

- ``cpSpaceStep`` order: integrate positions (with bias velocities, then
  reset) -> collide -> integrate velocities (damping**dt) -> arbiter
  preStep -> apply cached impulses (warm start) -> N solver iterations.
- body state is (world CoG, angle); rotation is about the CoG
  (``cpBodySetCenterOfGravity``), reported position is the body origin.
- sequential impulses per contact: bias impulse on the separate
  pseudo-velocity (split impulse), then normal impulse with accumulated
  clamping >= 0, then friction clamped to mu * jnAcc.
- ``biasCoef = 1 - collisionBias**dt`` with the default
  ``collisionBias = (1 - 0.1)**60``; ``slop = 0.1``.
- friction of a pair = u_a * u_b; shapes in the reference never set ``u``
  so every contact is frictionless (pusht_env.py:383/:436 set a dead
  ``body.friction`` attribute — pymunk friction lives on shapes).
- elasticity 0, gravity 0, ``space.damping = 0``.

The reference env builds on these exact semantics at
sim_a_splat/env/pusht/pusht_env.py:132-163 (PD + 10 substeps) and
:331-440 (space construction).
"""

from __future__ import annotations

import numpy as np


def _cross(a, b):
    return a[0] * b[1] - a[1] * b[0]


def _perp(v):
    return np.array([-v[1], v[0]])


class OracleBody:
    """Mutable rigid body, Chipmunk-style: ``p`` is the world CoG."""

    def __init__(self, mass, moment, cog_local=(0.0, 0.0), kinematic=False):
        self.m_inv = 0.0 if kinematic else 1.0 / mass
        self.i_inv = 0.0 if kinematic else 1.0 / moment
        self.cog = np.asarray(cog_local, float)
        self.p = np.zeros(2)       # world CoG
        self.a = 0.0
        self.v = np.zeros(2)
        self.w = 0.0
        self.v_bias = np.zeros(2)
        self.w_bias = 0.0
        self.kinematic = kinematic

    # reference-frame helpers -------------------------------------------------
    def rot(self):
        c, s = np.cos(self.a), np.sin(self.a)
        return np.array([[c, -s], [s, c]])

    @property
    def position(self):
        """Body-origin position (what pymunk reports as ``body.position``)."""
        return self.p - self.rot() @ self.cog

    @position.setter
    def position(self, value):
        self.p = np.asarray(value, float) + self.rot() @ self.cog

    def update_position(self, dt):
        self.p = self.p + (self.v + self.v_bias) * dt
        self.a = self.a + (self.w + self.w_bias) * dt
        self.v_bias = np.zeros(2)
        self.w_bias = 0.0

    def update_velocity(self, damping_pow):
        if not self.kinematic:
            self.v = self.v * damping_pow
            self.w = self.w * damping_pow

    def vel_at(self, r):
        return self.v + self.w * _perp(r)

    def bias_vel_at(self, r):
        return self.v_bias + self.w_bias * _perp(r)


class _ContactPoint:
    __slots__ = ("point", "dist", "cid", "r1", "r2", "n_mass", "t_mass",
                 "bias", "jn_acc", "jt_acc", "j_bias")

    def __init__(self, point, dist, cid):
        self.point = np.asarray(point, float)
        self.dist = float(dist)       # Chipmunk separation: negative = overlap
        self.cid = cid
        self.jn_acc = 0.0
        self.jt_acc = 0.0


class Arbiter:
    """One shape pair's contact set, persisting accumulated impulses."""

    def __init__(self, body_a, body_b, friction):
        self.a = body_a
        self.b = body_b
        self.u = friction
        self.normal = np.zeros(2)
        self.contacts = []

    def update(self, normal, new_contacts):
        """Install this step's contact set, inheriting cached impulses from
        last step's contacts with matching ids (cpArbiterUpdate)."""
        old = {c.cid: c for c in self.contacts}
        for c in new_contacts:
            if c.cid in old:
                c.jn_acc = old[c.cid].jn_acc
                c.jt_acc = old[c.cid].jt_acc
        self.normal = np.asarray(normal, float)
        self.contacts = new_contacts

    # --- solver (cpArbiter.c) -------------------------------------------------
    def pre_step(self, dt, slop, bias_coef):
        a, b, n = self.a, self.b, self.normal
        for c in self.contacts:
            c.r1 = c.point - a.p
            c.r2 = c.point - b.p
            c.n_mass = 1.0 / self._k_scalar(c, n)
            c.t_mass = 1.0 / self._k_scalar(c, _perp(n))
            c.bias = -bias_coef * min(0.0, c.dist + slop) / dt
            c.j_bias = 0.0
            # elasticity is 0 for every reference shape -> no bounce term

    def _k_scalar(self, c, n):
        a, b = self.a, self.b
        r1xn, r2xn = _cross(c.r1, n), _cross(c.r2, n)
        return (a.m_inv + b.m_inv + a.i_inv * r1xn * r1xn
                + b.i_inv * r2xn * r2xn)

    def _apply(self, c, j):
        a, b = self.a, self.b
        a.v = a.v - j * a.m_inv
        a.w = a.w - a.i_inv * _cross(c.r1, j)
        b.v = b.v + j * b.m_inv
        b.w = b.w + b.i_inv * _cross(c.r2, j)

    def _apply_bias(self, c, j):
        a, b = self.a, self.b
        a.v_bias = a.v_bias - j * a.m_inv
        a.w_bias = a.w_bias - a.i_inv * _cross(c.r1, j)
        b.v_bias = b.v_bias + j * b.m_inv
        b.w_bias = b.w_bias + b.i_inv * _cross(c.r2, j)

    def apply_cached_impulse(self, dt_coef):
        n = self.normal
        for c in self.contacts:
            j = (n * c.jn_acc + _perp(n) * c.jt_acc) * dt_coef
            self._apply(c, j)

    def apply_impulse(self):
        a, b, n = self.a, self.b, self.normal
        for c in self.contacts:
            # bias (position-correction pseudo velocity)
            vbn = (b.bias_vel_at(c.r2) - a.bias_vel_at(c.r1)) @ n
            jbn = (c.bias - vbn) * c.n_mass
            jbn_old = c.j_bias
            c.j_bias = max(jbn_old + jbn, 0.0)
            self._apply_bias(c, n * (c.j_bias - jbn_old))
            # normal
            vrn = (b.vel_at(c.r2) - a.vel_at(c.r1)) @ n
            jn = -vrn * c.n_mass
            jn_old = c.jn_acc
            c.jn_acc = max(jn_old + jn, 0.0)
            self._apply(c, n * (c.jn_acc - jn_old))
            # friction, clamped by u * jnAcc
            vrt = (b.vel_at(c.r2) - a.vel_at(c.r1)) @ _perp(n)
            jt = -vrt * c.t_mass
            jt_max = self.u * c.jn_acc
            jt_old = c.jt_acc
            c.jt_acc = float(np.clip(jt_old + jt, -jt_max, jt_max))
            self._apply(c, _perp(n) * (c.jt_acc - jt_old))


# --- narrowphase -------------------------------------------------------------

def circle_to_poly(center, radius, verts):
    """(normal a->b, [contact]) for circle body A vs convex poly B (world
    CCW verts), or (None, []).  Dist/normal via closest boundary feature;
    when the center is inside, the max-separation face."""
    nv = len(verts)
    best_out, best_in = None, None
    for i in range(nv):
        v0, v1 = verts[i], verts[(i + 1) % nv]
        e = v1 - v0
        face_n = -_perp(e)
        face_n = face_n / np.linalg.norm(face_n)
        sep = (center - v0) @ face_n
        if best_in is None or sep > best_in[0]:
            best_in = (sep, face_n)
        t = np.clip((center - v0) @ e / (e @ e), 0.0, 1.0)
        q = v0 + t * e
        d = np.linalg.norm(center - q)
        if best_out is None or d < best_out[0]:
            best_out = (d, q)
    if best_in[0] < 0.0:                       # center inside the poly
        dist = -(radius - best_in[0])          # always overlapping
        n = -best_in[1]                        # from circle into the poly
        point = center - best_in[1] * radius
        return n, [_ContactPoint(point, dist, 0)]
    d, q = best_out
    dist = d - radius
    if dist >= 0.0:
        return None, []
    n = (q - center) / max(d, 1e-12)           # from circle toward the poly
    point = center + n * radius
    return n, [_ContactPoint(point, dist, 0)]


def poly_to_wall(verts, wall_n, wall_b):
    """Contacts of a convex poly vs an infinite wall plane n.p >= b (normal
    points into the arena).  Up to the 2 deepest penetrating vertices, ids =
    vertex indices (Chipmunk's SegmentToPoly clip against a full-side
    segment reduces to exactly this).  Returns (normal wall->poly, list)."""
    seps = [v @ wall_n - wall_b for v in verts]
    order = np.argsort(seps)
    out = []
    for i in order[:2]:
        if seps[i] < 0.0:
            out.append(_ContactPoint(verts[i], seps[i], int(i)))
    return wall_n, out


# --- the pushT space ----------------------------------------------------------

class PushTOracle:
    """The reference pushT world (pusht_env.py:331-440) on the oracle."""

    def __init__(self, ws=(298.0, 512.0), scale=30.0, length=4.0,
                 sim_hz=100, block_cog=None):
        self.dt = 1.0 / sim_hz
        self.iterations = 10
        self.slop = 0.1
        self.collision_bias = (1.0 - 0.1) ** 60.0
        self.damping = 0.0

        # T-block: two boxes, both moments from the first vertex list
        # (the reference's inertia2-from-vertices1 quirk, pusht_env.py:417)
        v1 = np.array([(-length * scale / 2, scale), (length * scale / 2, scale),
                       (length * scale / 2, 0), (-length * scale / 2, 0)])
        v2 = np.array([(-scale / 2, scale), (-scale / 2, length * scale),
                       (scale / 2, length * scale), (scale / 2, scale)])
        self.polys_local = [v1, v2]
        moment = 2.0 * self._moment_for_poly(1.0, v1)
        cog = (v1.mean(axis=0) + v2.mean(axis=0)) / 2.0
        if block_cog is not None:
            cog = np.asarray(block_cog, float)
        self.block = OracleBody(1.0, moment, cog_local=cog)
        self.agent = OracleBody(0.0, 0.0, kinematic=True)
        self.agent_radius = 17.0

        m = 5.0 + 2.0                      # wall inset + segment radius
        self.walls = [(np.array([1.0, 0.0]), m),
                      (np.array([0.0, 1.0]), m),
                      (np.array([-1.0, 0.0]), -(ws[0] - m)),
                      (np.array([0.0, -1.0]), -(ws[1] - m))]

        # persistent arbiters keyed by shape pair (friction = u_a*u_b = 0)
        self.arbiters = {}
        for s in range(2):
            self.arbiters[("agent", s)] = Arbiter(self.agent, self.block, 0.0)
            for wi in range(4):
                self.arbiters[("wall", wi, s)] = Arbiter(
                    _WALL_BODY, self.block, 0.0)
        self.prev_dt = 0.0
        self.n_contact_points = 0

    @staticmethod
    def _moment_for_poly(mass, v):
        s1 = s2 = 0.0
        n = len(v)
        for i in range(n):
            a, b = v[i], v[(i + 1) % n]
            cr = b[0] * a[1] - b[1] * a[0]
            s1 += cr * (a @ a + a @ b + b @ b)
            s2 += cr
        return mass * s1 / (6.0 * s2)

    def world_polys(self):
        R = self.block.rot()
        origin = self.block.position
        return [origin + lv @ R.T for lv in self.polys_local]

    def set_state(self, agent_pos, block_pos, block_angle, legacy=False):
        """Reference ``_set_state`` incl. the legacy angle/position ordering
        quirk and the settling step (pusht_env.py:287-310)."""
        self.agent.position = np.asarray(agent_pos, float)
        self.agent.v = np.zeros(2)
        if legacy:
            self.block.position = np.asarray(block_pos, float)
            self.block.a = float(block_angle)   # rotates about the CoG:
            # p (world CoG) is kept, the reported origin moves
        else:
            self.block.a = float(block_angle)
            self.block.position = np.asarray(block_pos, float)
        self.block.v = np.zeros(2)
        self.block.w = 0.0
        self.step()

    def step(self):
        dt = self.dt
        # 1. integrate positions
        for body in (self.agent, self.block):
            body.update_position(dt)
        # 2. narrowphase at the new poses
        polys = self.world_polys()
        live = []
        for s in range(2):
            n, cts = circle_to_poly(
                self.agent.position, self.agent_radius, polys[s])
            arb = self.arbiters[("agent", s)]
            if cts:
                arb.update(n, cts)
                live.append(arb)
                self.n_contact_points += len(cts)
            else:
                arb.contacts = []
            for wi, (wn, wb) in enumerate(self.walls):
                n, cts = poly_to_wall(polys[s], wn, wb)
                arb = self.arbiters[("wall", wi, s)]
                if cts:
                    arb.update(n, cts)
                    live.append(arb)
                else:
                    arb.contacts = []
        # 3. integrate velocities (damping**dt; 0**dt = 0)
        damping_pow = self.damping ** dt if self.damping > 0 else 0.0
        self.block.update_velocity(damping_pow)
        # 4. solve
        bias_coef = 1.0 - self.collision_bias ** dt
        for arb in live:
            arb.pre_step(dt, self.slop, bias_coef)
        dt_coef = 0.0 if self.prev_dt == 0.0 else dt / self.prev_dt
        for arb in live:
            arb.apply_cached_impulse(dt_coef)
        for _ in range(self.iterations):
            for arb in live:
                arb.apply_impulse()
        self.prev_dt = dt

    def control_step(self, action, n_substeps=10, k_p=100.0, k_v=20.0):
        """Reference PD + substep loop (pusht_env.py:132-148)."""
        action = np.asarray(action, float)
        self.n_contact_points = 0
        for _ in range(n_substeps):
            acc = k_p * (action - self.agent.position) + k_v * (-self.agent.v)
            self.agent.v = self.agent.v + acc * self.dt
            self.step()

    def observation(self):
        return np.array([*self.agent.position, *self.block.position,
                         self.block.a])


# the walls belong to one shared static body
_WALL_BODY = OracleBody(0.0, 0.0, kinematic=True)


class ManipulatorOracle:
    """The manipulator task's planar contact world on the oracle: circle
    EEF (r = 0.013 m) vs the tblock_paper T-block in METERS, no walls —
    independent ground truth for ``ManipulatorEnvF._block_substep``
    (sim_a_splat_tpu/envs/manipulator_envs.py).  Same Chipmunk step
    algorithm as :class:`PushTOracle`; geometry/inertia from the SDF
    (assets/tblock_paper/tblock_paper.sdf:1-51)."""

    def __init__(self, dt=0.0025, mu=1.0, slop=1e-4,
                 crossbar_half=(0.1, 0.025), stem_half_x=0.025,
                 stem_y=(-0.175, -0.025), mass=0.2,
                 izz=0.003755952380952381, cog_y=-0.042857142857142844,
                 eef_radius=0.013):
        self.dt = dt
        self.iterations = 10
        self.slop = slop
        self.collision_bias = (1.0 - 0.1) ** 60.0
        self.damping = 0.0

        cx, cy = crossbar_half
        cb = np.array([(-cx, -cy), (cx, -cy), (cx, cy), (-cx, cy)])
        st = np.array([(-stem_half_x, stem_y[0]), (stem_half_x, stem_y[0]),
                       (stem_half_x, stem_y[1]), (-stem_half_x, stem_y[1])])
        self.polys_local = [cb, st]
        self.block = OracleBody(mass, izz, cog_local=(0.0, cog_y))
        self.agent = OracleBody(0.0, 0.0, kinematic=True)
        self.agent_radius = eef_radius
        self.arbiters = {
            ("agent", s): Arbiter(self.agent, self.block, mu)
            for s in range(2)
        }
        self.prev_dt = 0.0

    def world_polys(self):
        R = self.block.rot()
        origin = self.block.position
        return [origin + lv @ R.T for lv in self.polys_local]

    def set_state(self, block_pos, block_yaw):
        self.block.a = float(block_yaw)
        self.block.position = np.asarray(block_pos, float)
        self.block.v = np.zeros(2)
        self.block.w = 0.0

    def substep(self, eef_xy, eef_vel):
        """One contact substep with the EEF pinned at ``eef_xy`` moving at
        ``eef_vel`` (the env's interpolated kinematic EEF)."""
        dt = self.dt
        self.block.update_position(dt)
        self.agent.position = np.asarray(eef_xy, float)
        self.agent.v = np.asarray(eef_vel, float)
        polys = self.world_polys()
        live = []
        for s in range(2):
            n, cts = circle_to_poly(
                self.agent.position, self.agent_radius, polys[s])
            arb = self.arbiters[("agent", s)]
            if cts:
                arb.update(n, cts)
                live.append(arb)
            else:
                arb.contacts = []
        self.block.update_velocity(0.0)      # damping-0 quasi-statics
        bias_coef = 1.0 - self.collision_bias ** dt
        for arb in live:
            arb.pre_step(dt, self.slop, bias_coef)
        dt_coef = 0.0 if self.prev_dt == 0.0 else dt / self.prev_dt
        for arb in live:
            arb.apply_cached_impulse(dt_coef)
        for _ in range(self.iterations):
            for arb in live:
                arb.apply_impulse()
        self.prev_dt = dt
