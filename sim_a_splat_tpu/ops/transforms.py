"""SE(3) and Sim(3) transforms as pytrees.

The reference shuttles poses around as viser ``tf.SE3`` objects and 4×4
numpy matrices (splat_handler.py:78-83, :250-290).  Here a pose is a plain
pytree of arrays ``(quat wxyz, translation)`` so it flows through
``jit``/``vmap``/``scan`` and device meshes like any other array data.

``Sim3`` covers the ICP *similarity* transform the offline matcher produces
(scale·R | t); the factor-out of the scale from the rotation block mirrors
splat_handler.py:71-83.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sim_a_splat_tpu.ops import quaternion as quat


class SE3(NamedTuple):
    """Rigid transform: x ↦ R(q) x + t.  Batchable: (..., 4) / (..., 3)."""

    q: jnp.ndarray  # wxyz quaternion
    t: jnp.ndarray  # translation

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        q = jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype), batch_shape + (4,)
        )
        t = jnp.zeros(batch_shape + (3,), dtype)
        return SE3(q, t)

    @staticmethod
    def from_matrix(m: jnp.ndarray) -> "SE3":
        return SE3(quat.from_rotation_matrix(m[..., :3, :3]), m[..., :3, 3])

    def as_matrix(self) -> jnp.ndarray:
        R = quat.to_rotation_matrix(self.q)
        m = jnp.zeros(self.q.shape[:-1] + (4, 4), self.t.dtype)
        m = m.at[..., :3, :3].set(R)
        m = m.at[..., :3, 3].set(self.t)
        m = m.at[..., 3, 3].set(1.0)
        return m

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply to points x (..., 3)."""
        return quat.rotate(self.q, x) + self.t

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other (apply ``other`` first)."""
        return SE3(
            quat.multiply(self.q, other.q),
            quat.rotate(self.q, other.t) + self.t,
        )

    def inverse(self) -> "SE3":
        qinv = quat.conjugate(quat.normalize(self.q))
        return SE3(qinv, -quat.rotate(qinv, self.t))

    def rotation_matrix(self) -> jnp.ndarray:
        return quat.to_rotation_matrix(self.q)


class Sim3(NamedTuple):
    """Similarity transform: x ↦ s·R(q) x + t.

    This is the shape of the offline ICP registration artifact
    (``icp_transformation.npy``), whose 4×4 matrix has rotation block s·R;
    ``from_matrix`` performs the scale factor-out with the same
    orthogonality/isotropy validation as splat_handler.py:71-77.
    """

    q: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray  # scalar (or batch of scalars)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Sim3":
        se3 = SE3.identity(batch_shape, dtype)
        return Sim3(se3.q, se3.t, jnp.ones(batch_shape, dtype))

    @staticmethod
    def from_matrix(m, rtol: float = 1e-5):
        """Factor a 4×4 similarity matrix into (q, t, s).

        Host-side (numpy) validation mirror of the reference asserts
        (splat_handler.py:73-75): sR must satisfy (sR)ᵀ(sR) = s²I.
        """
        import numpy as np

        m = np.asarray(m, dtype=np.float64)
        cR = m[:3, :3]
        cI = cR.T @ cR
        off = cI[~np.eye(3, dtype=bool)]
        if not np.all(np.abs(off) < 1e-5):
            raise ValueError(f"similarity matrix rotation block not orthogonal: off-diag {off}")
        s2 = float(np.mean(np.diag(cI)))
        if not np.all(np.abs(np.diag(cI) - s2) < 1e-5 + rtol * s2):
            raise ValueError("similarity matrix scale is anisotropic")
        s = float(np.sqrt(s2))
        R = cR / s
        return Sim3(
            quat.from_rotation_matrix(jnp.asarray(R, jnp.float32)),
            jnp.asarray(m[:3, 3], jnp.float32),
            jnp.asarray(s, jnp.float32),
        )

    def se3(self) -> SE3:
        """The rigid part (scale dropped) — the reference's ``icp_transform``."""
        return SE3(self.q, self.t)

    def inverse(self) -> "Sim3":
        qinv = quat.conjugate(quat.normalize(self.q))
        s_inv = 1.0 / self.s
        t_inv = -s_inv * quat.rotate(qinv, self.t)
        return Sim3(qinv, t_inv, s_inv)

    def compose(self, other: "Sim3") -> "Sim3":
        """self ∘ other (apply ``other`` first): s₁R₁(s₂R₂x + t₂) + t₁."""
        return Sim3(
            quat.multiply(self.q, other.q),
            self.s * quat.rotate(self.q, other.t) + self.t,
            self.s * other.s,
        )

    def compose_se3(self, other: SE3) -> "Sim3":
        return self.compose(Sim3(other.q, other.t, jnp.ones_like(self.s)))

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.s[..., None] if getattr(self.s, "ndim", 0) else self.s
        return s * quat.rotate(self.q, x) + self.t

    def as_matrix(self) -> jnp.ndarray:
        R = quat.to_rotation_matrix(self.q) * self.s
        m = jnp.zeros(self.q.shape[:-1] + (4, 4), self.t.dtype)
        m = m.at[..., :3, :3].set(R)
        m = m.at[..., :3, 3].set(self.t)
        m = m.at[..., 3, 3].set(1.0)
        return m
