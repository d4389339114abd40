"""Gaussian splat scene pytree.

The TPU-native replacement for the reference's ``GSplatLoader`` attribute bag
(sim_a_splat/splat/splat_utils.py:13-118): raw (pre-activation) parameters in
one NamedTuple that flows through jit/vmap/grad/shard unchanged, with the
reference's activation semantics (splat_utils.py:36-45) applied on demand:

    scales    = exp(log_scales)
    opacities = sigmoid(logit_opacities)
    colors    = SH2RGB(sh_dc)          (DC band)

Keeping the *raw* parameters as the canonical state makes the scene directly
trainable (gradient steps on the same pytree the renderer consumes).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops import covariance, sh as sh_ops


class GaussianScene(NamedTuple):
    """N gaussians, raw (pre-activation) parameters.

    sh_rest is None for DC-only scenes; otherwise (N, K-1, 3) with
    K = (sh_degree+1)².
    """

    means: jnp.ndarray             # (N, 3)
    quats: jnp.ndarray             # (N, 4) wxyz, not necessarily normalized
    log_scales: jnp.ndarray        # (N, 3)
    logit_opacities: jnp.ndarray   # (N,)
    sh_dc: jnp.ndarray             # (N, 3)
    sh_rest: Optional[jnp.ndarray] = None

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        if self.sh_rest is None:
            return 0
        k = 1 + self.sh_rest.shape[1]
        return int(round(k ** 0.5)) - 1

    # --- activations (reference: splat_utils.py:36-45) ---

    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.log_scales)

    def opacities(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.logit_opacities)

    def covs(self) -> jnp.ndarray:
        """World-space 3×3 covariances Σ = R S Sᵀ Rᵀ."""
        return covariance.compute_cov(self.quats, self.scales())

    def covs_inv(self) -> jnp.ndarray:
        return covariance.compute_cov_inv(self.quats, self.scales())

    def colors_dc(self) -> jnp.ndarray:
        """DC-band RGB = SH2RGB(sh_dc) (reference splat_utils.py:41)."""
        return sh_ops.sh_to_rgb(self.sh_dc)

    def sh_coeffs(self) -> jnp.ndarray:
        """Full (N, K, 3) SH stack (DC prepended to the rest bands)."""
        if self.sh_rest is None:
            return self.sh_dc[:, None, :]
        return jnp.concatenate([self.sh_dc[:, None, :], self.sh_rest], axis=1)

    def select(self, idx: jnp.ndarray) -> "GaussianScene":
        """Gather a subset (mask indices or integer indices).

        When ``idx`` is a *concrete* contiguous ``arange`` run (the common
        case: scene graphs store each body's gaussians contiguously, so the
        static/dynamic split is a prefix/suffix), the gather is emitted as a
        ``lax.slice`` instead — round-3 profiling showed the 93k-row gather
        plus its scatter-add transpose cost ~10 ms/step on v5e, all of it
        avoidable layout traffic."""
        import numpy as np
        from jax import lax

        lo = None
        if not isinstance(idx, jax.core.Tracer):
            a = np.asarray(idx)
            if (a.ndim == 1 and a.dtype.kind in "iu" and a.size > 0
                    and int(a[0]) >= 0
                    and int(a[-1]) - int(a[0]) == a.size - 1
                    and np.all(np.diff(a) == 1)):
                lo = int(a[0])
                hi = lo + a.size

        def take(x):
            if lo is not None:
                return lax.slice_in_dim(x, lo, hi, axis=0)
            return x[idx]

        return GaussianScene(
            means=take(self.means),
            quats=take(self.quats),
            log_scales=take(self.log_scales),
            logit_opacities=take(self.logit_opacities),
            sh_dc=take(self.sh_dc),
            sh_rest=None if self.sh_rest is None else take(self.sh_rest),
        )

    def astype(self, dtype) -> "GaussianScene":
        return GaussianScene(*[
            None if f is None else f.astype(dtype) for f in self
        ])


