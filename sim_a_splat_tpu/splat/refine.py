"""Gaussian refinement ops: cull / split / duplicate.

Capability twin of the splatfacto model refinement the reference invokes
through nerfstudio (``cull_gaussians_refinement`` / ``split_gaussians``,
ns_utils/nerfstudio_utils.py:196-258) — here as pure functions on the
:class:`GaussianScene` pytree.  Note the reference uses them only offline
(densify/cull before point-cloud export); they are also the building blocks
of a future in-framework splat trainer.

Culling uses a boolean-mask + gather (host-side sizes), splitting samples
``n`` offsets from each gaussian's own distribution and shrinks scales by
1.6 (the splatfacto constant).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.ops import quaternion as quat
from sim_a_splat_tpu.splat.scene import GaussianScene

SPLIT_SCALE_SHRINK = 1.6   # splatfacto's size_fac


def cull_gaussians(
    scene: GaussianScene,
    cull_alpha_thresh: float = 0.1,
    cull_scale_thresh: float = 0.5,
) -> GaussianScene:
    """Drop gaussians with opacity < α-thresh or max scale > scale-thresh
    (reference cull_params, ns_utils/nerfstudio_utils.py:186-205)."""
    opac = np.asarray(scene.opacities())
    scales = np.asarray(scene.scales())
    keep = (opac >= cull_alpha_thresh) & (scales.max(-1) <= cull_scale_thresh)
    return scene.select(jnp.asarray(np.flatnonzero(keep)))


def split_gaussians(
    scene: GaussianScene,
    split_mask: np.ndarray | None = None,
    n_split_samples: int = 2,
    seed: int = 0,
) -> GaussianScene:
    """Replace masked gaussians by ``n`` samples from their own
    distribution with scales shrunk by 1.6 (splatfacto split semantics;
    reference split_params ns_utils/nerfstudio_utils.py:210-240)."""
    n = scene.num_gaussians
    mask = np.ones(n, bool) if split_mask is None else np.asarray(split_mask)
    sel = scene.select(jnp.asarray(np.flatnonzero(mask)))
    m = sel.num_gaussians
    key = jax.random.key(seed)
    eps = jax.random.normal(key, (n_split_samples, m, 3))
    offsets = eps * sel.scales()[None]                      # local frame
    world_off = quat.rotate(jnp.broadcast_to(sel.quats, (n_split_samples, m, 4)),
                            offsets)
    new_means = (sel.means[None] + world_off).reshape(-1, 3)

    def rep(a):
        return jnp.tile(a, (n_split_samples,) + (1,) * (a.ndim - 1))

    split = GaussianScene(
        means=new_means,
        quats=rep(sel.quats),
        log_scales=rep(sel.log_scales) - jnp.log(SPLIT_SCALE_SHRINK),
        logit_opacities=rep(sel.logit_opacities),
        sh_dc=rep(sel.sh_dc),
        sh_rest=None if sel.sh_rest is None else rep(sel.sh_rest),
    )
    keep = scene.select(jnp.asarray(np.flatnonzero(~mask)))
    if keep.num_gaussians == 0:
        return split
    from sim_a_splat_tpu.tools.mesh_to_splat import concat_scenes
    return concat_scenes(keep, split)


def duplicate_gaussians(scene: GaussianScene,
                        dup_mask: np.ndarray) -> GaussianScene:
    """Append copies of the masked gaussians (splatfacto dup_gaussians)."""
    sel = scene.select(jnp.asarray(np.flatnonzero(np.asarray(dup_mask))))
    from sim_a_splat_tpu.tools.mesh_to_splat import concat_scenes
    return concat_scenes(scene, sel)
