"""Gaussians from a triangle mesh (task objects without trained splats).

The reference shows task objects (the T-block) as *mesh handles* next to
the splats (splat_handler.py:199-219) because viser can mix the two.  Our
renderer draws one gaussian batch, so meshes become surface-sampled
"flat" gaussians: disks aligned to the local surface normal.  One
rasterizer call then renders the whole frame.
"""

from __future__ import annotations

import numpy as np

from sim_a_splat_tpu.splat.scene import GaussianScene
from sim_a_splat_tpu.tools.meshio import TriMesh, sample_surface


def mesh_to_splat(
    mesh: TriMesh,
    n: int = 2000,
    color=(0.7, 0.7, 0.7),
    thickness_ratio: float = 0.1,
    opacity: float = 0.95,
    seed: int = 0,
) -> GaussianScene:
    """Surface-sampled disk gaussians approximating the mesh."""
    import jax.numpy as jnp
    from sim_a_splat_tpu.ops import quaternion as quat, sh as sh_ops

    rng = np.random.default_rng(seed)
    areas = mesh.face_areas()
    probs = areas / max(areas.sum(), 1e-12)
    fi = rng.choice(mesh.num_faces, n, p=probs)
    u, v = rng.uniform(size=(2, n, 1))
    flip = (u + v) > 1.0
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    a = mesh.vertices[mesh.faces[fi, 0]]
    b = mesh.vertices[mesh.faces[fi, 1]]
    c = mesh.vertices[mesh.faces[fi, 2]]
    pts = a + u * (b - a) + v * (c - a)

    normals = np.cross(b - a, c - a)
    normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True),
                          1e-12)
    # disk radius ~ sqrt of the surface area share each gaussian covers
    radius = np.sqrt(areas.sum() / n) * 0.8
    scales = np.stack([
        np.full(n, radius), np.full(n, radius),
        np.full(n, radius * thickness_ratio)], -1)

    # rotation taking +z to the surface normal
    z = np.array([0.0, 0.0, 1.0])
    vaxis = np.cross(np.tile(z, (n, 1)), normals)
    s = np.linalg.norm(vaxis, axis=-1)
    dotp = normals @ z
    angle = np.arctan2(s, dotp)
    axis = np.where(s[:, None] > 1e-8, vaxis / np.maximum(s[:, None], 1e-12),
                    np.tile([1.0, 0, 0], (n, 1)))
    quats = np.asarray(quat.from_axis_angle(jnp.asarray(axis, jnp.float32),
                                            jnp.asarray(angle, jnp.float32)))

    col = np.tile(np.asarray(color, np.float32), (n, 1))
    logit_op = np.log(opacity / (1 - opacity))
    return GaussianScene(
        means=jnp.asarray(pts, jnp.float32),
        quats=jnp.asarray(quats, jnp.float32),
        log_scales=jnp.asarray(np.log(np.maximum(scales, 1e-8)), jnp.float32),
        logit_opacities=jnp.full((n,), logit_op, jnp.float32),
        sh_dc=jnp.asarray(sh_ops.rgb_to_sh(col), jnp.float32),
    )


def concat_scenes(*scenes: GaussianScene) -> GaussianScene:
    """Concatenate gaussian batches (sh_rest must be uniformly present)."""
    import jax.numpy as jnp

    has_rest = [s.sh_rest is not None for s in scenes]
    if any(has_rest) and not all(has_rest):
        k = max(s.sh_rest.shape[1] for s in scenes if s.sh_rest is not None)
        scenes = tuple(
            s if s.sh_rest is not None else s._replace(
                sh_rest=jnp.zeros((s.num_gaussians, k, 3), jnp.float32))
            for s in scenes)
    fields = {}
    for name in GaussianScene._fields:
        vals = [getattr(s, name) for s in scenes]
        fields[name] = None if vals[0] is None else jnp.concatenate(vals)
    return GaussianScene(**fields)
