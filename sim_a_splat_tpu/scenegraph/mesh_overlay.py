"""URDF link-mesh overlay: render robot/task visual geometry next to the
splats.

The reference draws URDF link meshes and the task mesh alongside the splat
handles through viser trimesh handles
(/root/reference/sim_a_splat/splat/splat_handler.py:145-219: urchin FK at
the saved joint config, per-link ``add_mesh_trimesh`` scaled by the ICP
scale factor).  Our renderer draws one gaussian batch, so link visuals
become surface-sampled disk gaussians (tools/mesh_to_splat.py) assembled
into a :class:`SceneGraph` whose link ids follow the kinematic chain —
per-frame FK poses move them exactly like the splat links, and one
rasterizer call draws scene + overlay together.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np

from sim_a_splat_tpu.messaging.draw import (
    GEOM_BOX, GEOM_CYLINDER, GEOM_MESH, GEOM_SPHERE, GeomSchema,
)
from sim_a_splat_tpu.ops.transforms import SE3
from sim_a_splat_tpu.physics import kinematics as kin
from sim_a_splat_tpu.scenegraph.graph import SceneGraph
from sim_a_splat_tpu.splat.scene import GaussianScene
from sim_a_splat_tpu.tools.mesh_to_splat import concat_scenes, mesh_to_splat
from sim_a_splat_tpu.tools.meshio import (
    TriMesh, box_mesh, cylinder_mesh, icosphere, load_mesh,
)

_TYPE_OF = {"box": GEOM_BOX, "sphere": GEOM_SPHERE,
            "cylinder": GEOM_CYLINDER, "mesh": GEOM_MESH}


def geom_of_visual(link_name: str, vis: kin.VisualInfo) -> GeomSchema:
    """VisualInfo (URDF parse) → GeomSchema record (the Geom adapter's
    fields: name/position/quaternion/color, geom.py:25-48)."""
    q = kin._rpy_to_quat_np(np.asarray(vis.origin_rpy, np.float64))
    if vis.geom_type == "mesh":
        fdata = tuple(vis.scale)
    else:
        fdata = tuple(vis.size)
    return GeomSchema(
        name=link_name, type=_TYPE_OF[vis.geom_type],
        position=tuple(vis.origin_xyz), quaternion=tuple(q),
        color=tuple(vis.color), string_data=vis.mesh_path or "",
        float_data=fdata)


def visual_mesh(vis: kin.VisualInfo,
                resolve: Optional[Callable[[str], Path]] = None) -> TriMesh:
    """Build the TriMesh of one URDF visual (local frame: origin applied)."""
    if vis.geom_type == "mesh":
        path = vis.mesh_path
        if resolve is not None:
            path = resolve(path)
        mesh = load_mesh(path)
        s = np.asarray(vis.scale, np.float64)
        mesh = TriMesh(mesh.vertices * s, mesh.faces)
    elif vis.geom_type == "box":
        mesh = box_mesh(*vis.size)
    elif vis.geom_type == "cylinder":
        mesh = cylinder_mesh(*vis.size)
    elif vis.geom_type == "sphere":
        m = icosphere(2)
        mesh = TriMesh(m.vertices * vis.size[0], m.faces)
    else:
        raise ValueError(f"unknown geom type {vis.geom_type}")

    import jax.numpy as jnp
    from sim_a_splat_tpu.ops import quaternion as quat

    q = kin._rpy_to_quat_np(np.asarray(vis.origin_rpy, np.float64))
    R = np.asarray(quat.to_rotation_matrix(jnp.asarray(q, jnp.float32)),
                   np.float64)
    v = mesh.vertices @ R.T + np.asarray(vis.origin_xyz)
    return TriMesh(v, mesh.faces)


def urdf_overlay_graph(
    chain: kin.KinematicChain,
    q_rest,
    n_per_link: int = 600,
    resolve: Optional[Callable[[str], Path]] = None,
    base: Optional[SE3] = None,
    seed: int = 0,
) -> Optional[SceneGraph]:
    """SceneGraph of disk-gaussian link visuals, posed at ``q_rest``.

    Per-frame: ``overlay.posed(SE3-prepend-identity(fk(chain, q, base)))``
    moves every link's gaussians with the arm — the TPU-native equivalent
    of the reference's viser mesh handles driven by the draw message
    (splat_handler.py:282-289).  Returns None when no link has a visual.
    """
    import jax.numpy as jnp

    if base is None:
        base = SE3.identity()
    rest = kin.fk(chain, jnp.asarray(q_rest, jnp.float32), base)

    parts = []
    ids = []
    for i in range(chain.num_links):
        vis = chain.visuals[i]
        if vis is None:
            continue
        mesh = visual_mesh(vis, resolve)
        local = mesh_to_splat(mesh, n=n_per_link, color=tuple(vis.color[:3]),
                              seed=seed + i)
        # move into world at the rest configuration
        from sim_a_splat_tpu.ops import quaternion as quat
        q_i, t_i = rest.q[i], rest.t[i]
        local = local._replace(
            means=quat.rotate(q_i, local.means) + t_i,
            quats=quat.multiply(q_i, local.quats))
        parts.append(local)
        ids.append(np.full(local.num_gaussians, i, np.int32))
    if not parts:
        return None
    scene = concat_scenes(*parts)
    link_ids = jnp.asarray(np.concatenate(ids) + 1, jnp.int32)
    # rest poses indexed 1..L in chain-link order; slot 0 = static/identity
    rest_poses = SE3(
        jnp.concatenate([jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), rest.q]),
        jnp.concatenate([jnp.zeros((1, 3), jnp.float32), rest.t]))
    return SceneGraph(scene=scene, link_ids=link_ids, rest_inv=(
        _rest_inv_with_identity0(rest_poses)))


def _rest_inv_with_identity0(rest_poses: SE3) -> SE3:
    import jax.numpy as jnp

    inv = rest_poses.inverse()
    return SE3(inv.q.at[0].set(jnp.asarray([1.0, 0, 0, 0])),
               inv.t.at[0].set(0.0))


def overlay_frame_poses(chain: kin.KinematicChain, q,
                        base: Optional[SE3] = None) -> SE3:
    """(L+1,) body poses for ``SceneGraph.posed`` — identity slot 0 plus
    the current FK world poses."""
    import jax.numpy as jnp

    if base is None:
        base = SE3.identity()
    fkp = kin.fk(chain, q, base)
    return SE3(
        jnp.concatenate([jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), fkp.q]),
        jnp.concatenate([jnp.zeros((1, 3), jnp.float32), fkp.t]))
