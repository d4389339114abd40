"""URDF kinematic chains: FK, differential IK, joint-space PD dynamics.

TPU-native replacement for three native components of the reference
(SURVEY.md §2.3 N3/N4/N5):

- Drake MultibodyPlant FK / urchin URDF FK (splat_handler.py:158-163,
  manipulator_env.py:357-390): here a host-side URDF parse produces a static
  chain structure; ``fk`` unrolls the (small, fixed) link tree into pure jnp
  quaternion composition — the structure is a compile-time constant, only
  ``q`` is traced, so FK jits/vmaps/differentiates freely.
- Drake InverseKinematics + SNOPT (manipulator_eef_wrapper.py:54-82):
  damped-least-squares IK with the Jacobian obtained by ``jax.jacfwd``
  through FK (no hand-derived Jacobians), fixed iteration count, reporting
  the same position/orientation tolerances as the reference constraints.
- Drake InverseDynamicsController + StateInterpolatorWithDiscreteDerivative
  (manipulator_sim_utils.py:188-242): the controller cancels plant dynamics,
  so the closed loop Drake realizes is per-joint
  ``q̈ = kp·(qd − q) + kd·(q̇d − q̇)`` with q̇d from the discrete
  derivative of targets — integrated here directly (semi-implicit Euler
  substeps), which reproduces the *behavior* without a C++ plant.

URDF parsing is stdlib ``xml.etree`` only (no urchin/drake dependency).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import NamedTuple
import xml.etree.ElementTree as ET

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops import quaternion as quat
from sim_a_splat_tpu.ops.transforms import SE3

JOINT_FIXED = 0
JOINT_REVOLUTE = 1   # includes "continuous"
JOINT_PRISMATIC = 2


@dataclasses.dataclass(frozen=True)
class VisualInfo:
    """Host-side visual geometry metadata (offline match pipeline + the
    Geom-schema / mesh-overlay path).  ``geom_type`` ∈ {"mesh", "box",
    "cylinder", "sphere"}; ``size`` carries the primitive dimensions (box
    x/y/z, cylinder (radius, length), sphere (radius,)); ``color`` is the
    URDF material rgba (defaults to the reference's LightSlateGray-ish
    grey)."""

    mesh_path: str | None
    origin_xyz: tuple
    origin_rpy: tuple
    scale: tuple
    geom_type: str = "mesh"
    size: tuple = ()
    color: tuple = (0.7, 0.7, 0.7, 1.0)


@dataclasses.dataclass(frozen=True)
class KinematicChain:
    """Static (host, numpy) kinematic structure of a URDF robot.

    Links are stored in topological order (parents before children);
    ``parent[i] < i`` always, ``parent[root] == -1``.  Hashable by identity —
    safe to close over in jitted functions.
    """

    link_names: tuple
    joint_names: tuple
    parent: np.ndarray        # (L,) int
    jtype: np.ndarray         # (L,) int — joint connecting link i to parent
    qidx: np.ndarray          # (L,) int — actuated dof index or -1
    origin_q: np.ndarray      # (L, 4) wxyz — fixed joint origin rotation
    origin_t: np.ndarray      # (L, 3)
    axis: np.ndarray          # (L, 3)
    lower: np.ndarray         # (ndof,)
    upper: np.ndarray         # (ndof,)
    velocity_limit: np.ndarray  # (ndof,)
    effort_limit: np.ndarray    # (ndof,)
    visuals: tuple            # (L,) VisualInfo or None

    @property
    def num_links(self) -> int:
        return len(self.link_names)

    @property
    def ndof(self) -> int:
        return len(self.lower)

    def link_index(self, name: str) -> int:
        return self.link_names.index(name)

    def actuated_joint_names(self) -> tuple:
        order = {}
        for i in range(self.num_links):
            if self.qidx[i] >= 0:
                order[int(self.qidx[i])] = self.joint_names[i]
        return tuple(order[i] for i in range(self.ndof))


def _rpy_to_quat_np(rpy: np.ndarray) -> np.ndarray:
    """Numpy twin of ops.quaternion.from_rpy (Drake RollPitchYaw convention,
    R = Rz(y)·Ry(p)·Rx(r)).  URDF parsing is host-side; routing it through
    jnp costs a device dispatch per joint — minutes over the reference's 28
    URDFs on a remote-dispatch platform."""
    r, p, y = rpy[0] * 0.5, rpy[1] * 0.5, rpy[2] * 0.5
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    return np.array([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ])


def _rpy_xyz(el) -> tuple[np.ndarray, np.ndarray]:
    if el is None:
        return np.zeros(3), np.zeros(3)
    xyz = np.fromstring(el.get("xyz", "0 0 0"), sep=" ")
    rpy = np.fromstring(el.get("rpy", "0 0 0"), sep=" ")
    return rpy, xyz


def load_chain(urdf_path: str | Path, root: str | None = None) -> KinematicChain:
    """Parse a URDF file into a :class:`KinematicChain`.

    Equivalent of the reference's ``urchin.URDF.load`` usage
    (splat_handler.py:156-163, match_splat.py:64-71) without the dependency.
    """
    tree = ET.parse(str(urdf_path))
    robot = tree.getroot()

    # named materials declared at robot level (URDF allows color reuse)
    mat_colors: dict[str, tuple] = {}
    for m in robot.findall("material"):
        c = m.find("color")
        if m.get("name") and c is not None:
            mat_colors[m.get("name")] = tuple(
                np.fromstring(c.get("rgba", "0.7 0.7 0.7 1"), sep=" "))

    links = [l.get("name") for l in robot.findall("link")]
    visual_by_link: dict[str, VisualInfo | None] = {}
    for l in robot.findall("link"):
        vis = l.find("visual")
        info = None
        if vis is not None:
            rpy, xyz = _rpy_xyz(vis.find("origin"))
            color = (0.7, 0.7, 0.7, 1.0)
            mat = vis.find("material")
            if mat is not None:
                c = mat.find("color")
                if c is not None:
                    color = tuple(np.fromstring(
                        c.get("rgba", "0.7 0.7 0.7 1"), sep=" "))
                elif mat.get("name") in mat_colors:
                    color = mat_colors[mat.get("name")]
            geo = vis.find("geometry/mesh")
            box = vis.find("geometry/box")
            cyl = vis.find("geometry/cylinder")
            sph = vis.find("geometry/sphere")
            if geo is not None:
                scale = np.fromstring(geo.get("scale", "1 1 1"), sep=" ")
                info = VisualInfo(
                    mesh_path=geo.get("filename"),
                    origin_xyz=tuple(xyz), origin_rpy=tuple(rpy),
                    scale=tuple(scale), geom_type="mesh", color=color)
            elif box is not None:
                info = VisualInfo(
                    mesh_path=None, origin_xyz=tuple(xyz),
                    origin_rpy=tuple(rpy), scale=(1.0, 1.0, 1.0),
                    geom_type="box",
                    size=tuple(np.fromstring(box.get("size", "1 1 1"),
                                             sep=" ")),
                    color=color)
            elif cyl is not None:
                info = VisualInfo(
                    mesh_path=None, origin_xyz=tuple(xyz),
                    origin_rpy=tuple(rpy), scale=(1.0, 1.0, 1.0),
                    geom_type="cylinder",
                    size=(float(cyl.get("radius", "0.05")),
                          float(cyl.get("length", "0.1"))),
                    color=color)
            elif sph is not None:
                info = VisualInfo(
                    mesh_path=None, origin_xyz=tuple(xyz),
                    origin_rpy=tuple(rpy), scale=(1.0, 1.0, 1.0),
                    geom_type="sphere",
                    size=(float(sph.get("radius", "0.05")),),
                    color=color)
        visual_by_link[l.get("name")] = info

    joints = []
    child_of = {}
    for j in robot.findall("joint"):
        jd = {
            "name": j.get("name"),
            "type": j.get("type"),
            "parent": j.find("parent").get("link"),
            "child": j.find("child").get("link"),
        }
        rpy, xyz = _rpy_xyz(j.find("origin"))
        jd["rpy"], jd["xyz"] = rpy, xyz
        ax = j.find("axis")
        jd["axis"] = (np.fromstring(ax.get("xyz"), sep=" ")
                      if ax is not None else np.array([1.0, 0, 0]))
        lim = j.find("limit")
        jd["limit"] = (
            float(lim.get("lower", "-inf")) if lim is not None else -np.inf,
            float(lim.get("upper", "inf")) if lim is not None else np.inf,
            float(lim.get("velocity", "inf")) if lim is not None else np.inf,
            float(lim.get("effort", "inf")) if lim is not None else np.inf,
        )
        joints.append(jd)
        child_of[jd["child"]] = jd

    if root is None:
        roots = [l for l in links if l not in child_of]
        if len(roots) != 1:
            raise ValueError(f"expected one root link, found {roots}")
        root = roots[0]

    # topological order by BFS from the root
    children: dict[str, list] = {l: [] for l in links}
    for jd in joints:
        if jd["parent"] in children:
            children[jd["parent"]].append(jd["child"])
    order = [root]
    seen = {root}
    i = 0
    while i < len(order):
        for c in children[order[i]]:
            if c not in seen:
                seen.add(c)
                order.append(c)
        i += 1

    L = len(order)
    idx = {n: i for i, n in enumerate(order)}
    parent = np.full(L, -1, np.int32)
    jtype = np.zeros(L, np.int32)
    qidx = np.full(L, -1, np.int32)
    origin_q = np.tile(np.array([1.0, 0, 0, 0]), (L, 1)).astype(np.float32)
    origin_t = np.zeros((L, 3), np.float32)
    axis = np.tile(np.array([1.0, 0, 0]), (L, 1)).astype(np.float32)
    joint_names = [""] * L
    lower, upper, vlim, elim = [], [], [], []

    type_map = {"fixed": JOINT_FIXED, "revolute": JOINT_REVOLUTE,
                "continuous": JOINT_REVOLUTE, "prismatic": JOINT_PRISMATIC,
                "floating": JOINT_FIXED, "planar": JOINT_FIXED}
    ndof = 0
    for name in order[1:] if order else []:
        jd = child_of[name]
        i = idx[name]
        parent[i] = idx[jd["parent"]]
        jtype[i] = type_map.get(jd["type"], JOINT_FIXED)
        joint_names[i] = jd["name"]
        origin_q[i] = _rpy_to_quat_np(np.asarray(jd["rpy"], np.float64))
        origin_t[i] = jd["xyz"]
        a = jd["axis"]
        axis[i] = a / max(np.linalg.norm(a), 1e-9)
        if jtype[i] != JOINT_FIXED:
            qidx[i] = ndof
            ndof += 1
            lo, hi, v, e = jd["limit"]
            if jd["type"] == "continuous":
                lo, hi = -np.inf, np.inf
            lower.append(lo); upper.append(hi); vlim.append(v); elim.append(e)

    return KinematicChain(
        link_names=tuple(order),
        joint_names=tuple(joint_names),
        parent=parent, jtype=jtype, qidx=qidx,
        origin_q=origin_q, origin_t=origin_t, axis=axis,
        lower=np.asarray(lower, np.float32),
        upper=np.asarray(upper, np.float32),
        velocity_limit=np.asarray(vlim, np.float32),
        effort_limit=np.asarray(elim, np.float32),
        visuals=tuple(visual_by_link[n] for n in order),
    )


def fk(chain: KinematicChain, q: jnp.ndarray,
       base: SE3 | None = None) -> SE3:
    """World pose of every link, batched SE3 with leading dim L.

    The tree is unrolled at trace time (parents first), so this compiles to
    a fixed chain of quaternion products; differentiable in ``q`` and
    ``base`` (the weld transform, reference manipulator_sim_utils.py:139-143).
    """
    if base is None:
        base = SE3.identity()
    q = jnp.asarray(q)
    qs: list = [None] * chain.num_links
    ts: list = [None] * chain.num_links
    qs[0], ts[0] = base.q, base.t
    for i in range(1, chain.num_links):
        oq = jnp.asarray(chain.origin_q[i])
        ot = jnp.asarray(chain.origin_t[i])
        jt = int(chain.jtype[i])
        if jt == JOINT_REVOLUTE:
            jq = quat.from_axis_angle(jnp.asarray(chain.axis[i]),
                                      q[int(chain.qidx[i])])
            lq = quat.multiply(oq, jq)
            lt = ot
        elif jt == JOINT_PRISMATIC:
            lq = oq
            lt = ot + quat.rotate(oq, jnp.asarray(chain.axis[i])
                                  * q[int(chain.qidx[i])])
        else:
            lq, lt = oq, ot
        p = int(chain.parent[i])
        qs[i] = quat.multiply(qs[p], lq)
        ts[i] = quat.rotate(qs[p], lt) + ts[p]
    return SE3(jnp.stack(qs), jnp.stack(ts))


def link_pose(chain: KinematicChain, q: jnp.ndarray, link: str | int,
              base: SE3 | None = None) -> SE3:
    i = chain.link_index(link) if isinstance(link, str) else int(link)
    poses = fk(chain, q, base)
    return SE3(poses.q[i], poses.t[i])


def orientation_error(q_target: jnp.ndarray, q_current: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector error (axis·angle) taking q_current to q_target."""
    dq = quat.multiply(q_target, quat.conjugate(quat.normalize(q_current)))
    dq = jnp.where(dq[..., :1] < 0, -dq, dq)        # shortest arc
    w = jnp.clip(dq[..., 0], -1.0, 1.0)
    vec = dq[..., 1:]
    # gradient-safe rotvec: norm() has a NaN derivative at 0, which would
    # poison the jacfwd-based IK Jacobian exactly when the error is solved —
    # use the smooth small-angle limit 2·vec instead
    n2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
    eps = 1e-12
    n = jnp.sqrt(jnp.maximum(n2, eps))
    angle = 2.0 * jnp.arctan2(n[..., 0], w)
    scale = jnp.where(n2[..., 0] > eps, angle / n[..., 0], 2.0)
    return vec * scale[..., None]


class IKResult(NamedTuple):
    q: jnp.ndarray
    pos_err: jnp.ndarray     # final position error norm
    ori_err: jnp.ndarray     # final orientation error angle (rad)
    converged: jnp.ndarray   # bool, reference tolerances met


def ik(
    chain: KinematicChain,
    link: str | int,
    target: SE3,
    q0: jnp.ndarray,
    base: SE3 | None = None,
    iterations: int = 60,
    damping: float = 1e-2,
    max_step: float = 0.3,
    pos_tol: float = 1e-4,
    theta_bound: float = 0.01,
    ori_weight: float = 1.0,
) -> IKResult:
    """Damped-least-squares IK to a full 6-DoF target.

    Matches the constraint tolerances of the reference's Drake IK
    (manipulator_eef_wrapper.py:59-82: position within ±1e-4, orientation
    within ``theta_bound``); instead of raising on failure it returns a
    ``converged`` flag (the functional-core analogue of the RuntimeError at
    :79-80 — the env wrapper turns it into an error/penalty).
    """
    i = chain.link_index(link) if isinstance(link, str) else int(link)
    lo = jnp.asarray(chain.lower)
    hi = jnp.asarray(chain.upper)
    lo = jnp.where(jnp.isfinite(lo), lo, -1e6)
    hi = jnp.where(jnp.isfinite(hi), hi, 1e6)

    def err(qj):
        poses = fk(chain, qj, base)
        e_p = target.t - poses.t[i]
        e_o = ori_weight * orientation_error(quat.normalize(target.q),
                                             poses.q[i])
        return jnp.concatenate([e_p, e_o])

    jac = jax.jacfwd(err)

    def body(_, qj):
        e = err(qj)
        J = jac(qj)                                   # (6, ndof)
        JJt = J @ J.T + damping * jnp.eye(6, dtype=qj.dtype)
        dq = -J.T @ jnp.linalg.solve(JJt, e)   # J = ∂e/∂q ⇒ Newton is −J⁺e
        # trust region: undamped Gauss-Newton steps overshoot badly on
        # near-singular arms and bounce between joint limits
        n = jnp.linalg.norm(dq)
        dq = dq * jnp.minimum(1.0, max_step / jnp.maximum(n, 1e-9))
        return jnp.clip(qj + dq, lo, hi)

    qf = jax.lax.fori_loop(0, iterations, body, jnp.asarray(q0))
    e = err(qf)
    pos_err = jnp.linalg.norm(e[:3])
    ori_err = jnp.linalg.norm(e[3:]) / ori_weight
    return IKResult(
        q=qf, pos_err=pos_err, ori_err=ori_err,
        converged=(pos_err <= pos_tol * 3.0) & (ori_err <= theta_bound),
    )


# --- joint-space PD dynamics (the InverseDynamicsController closed loop) ----

class ArmState(NamedTuple):
    q: jnp.ndarray            # (ndof,)
    qd: jnp.ndarray           # (ndof,)
    target_prev: jnp.ndarray  # (ndof,) previous position target (for q̇d)


def arm_init(chain: KinematicChain, q: jnp.ndarray) -> ArmState:
    q = jnp.asarray(q, jnp.float32)
    return ArmState(q=q, qd=jnp.zeros_like(q), target_prev=q)


def arm_step(
    chain: KinematicChain,
    state: ArmState,
    target: jnp.ndarray,
    dt: float = 1e-2,
    kp: float = 100.0,
    kd: float = 20.0,
    substeps: int = 4,
) -> ArmState:
    """One control step of the Drake-equivalent closed loop.

    InverseDynamicsController (kp=100, kd=20, manipulator_sim_utils.py:
    210-218) + StateInterpolatorWithDiscreteDerivative (:225-230) yield
    ``q̈ = kp (qd_pos − q) + kd (qd_vel − q̇)`` with
    ``qd_vel = (target − target_prev)/dt``; integrated with semi-implicit
    Euler substeps and joint position/velocity limits applied.
    """
    target = jnp.asarray(target)
    qd_vel = (target - state.target_prev) / dt
    h = dt / substeps
    lo = jnp.asarray(chain.lower)
    hi = jnp.asarray(chain.upper)
    lo = jnp.where(jnp.isfinite(lo), lo, -1e6)
    hi = jnp.where(jnp.isfinite(hi), hi, 1e6)
    vmax = jnp.asarray(chain.velocity_limit)
    vmax = jnp.where(jnp.isfinite(vmax), vmax, 1e6)

    def sub(carry, _):
        qj, qdj = carry
        acc = kp * (target - qj) + kd * (qd_vel - qdj)
        qdj = jnp.clip(qdj + acc * h, -vmax, vmax)
        qj = jnp.clip(qj + qdj * h, lo, hi)
        return (qj, qdj), None

    (qf, qdf), _ = jax.lax.scan(sub, (state.q, state.qd), None, length=substeps)
    return ArmState(q=qf, qd=qdf, target_prev=target)
