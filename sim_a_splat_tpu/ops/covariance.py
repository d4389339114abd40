"""Gaussian covariance composition, pure jnp.

Reference semantics (sim_a_splat/ellipsoids/covariance_utils.py:145-157):
``compute_cov(quat, scaling) = (R S)(R S)ᵀ`` with S = diag(scaling); the
inverse covariance is computed by passing ``1/scaling``
(splat_utils.py:38-39).  Same math here, batch-first and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from sim_a_splat_tpu.ops import quaternion as quat


def compute_cov(q: jnp.ndarray, scaling: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quats + (..., 3) scales → (..., 3, 3) covariances.

    Σ = R S Sᵀ Rᵀ = (R S)(R S)ᵀ — identical to the reference's
    ``compute_cov`` with ``exp=False`` (activations applied by the caller).
    """
    R = quat.to_rotation_matrix(q)
    M = R * scaling[..., None, :]  # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def compute_cov_inv(q: jnp.ndarray, scaling: jnp.ndarray) -> jnp.ndarray:
    """Inverse covariance via reciprocal scales (reference splat_utils.py:38)."""
    return compute_cov(q, 1.0 / scaling)


def transform_cov(R: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """Rotate covariances: Σ' = R Σ Rᵀ (R broadcastable against cov batch)."""
    return R @ cov @ jnp.swapaxes(R, -1, -2)
