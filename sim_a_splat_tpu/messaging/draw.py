"""Typed sim→splat bridge structs — the LCM viewer-message analogue.

The reference ships body poses from Drake to the splat scene through LCM
viewer messages: ``lcmt_viewer_load_robot`` declares the link schema once
(manipulator_env.py:357-376, adapted by messaging/link.py + geom.py) and
``lcmt_viewer_draw`` carries per-frame poses (manipulator_env.py:377-390,
consumed at splat_handler.py:227-314).

TPU-natively there is no message bus: the schema is a static host-side
description and the per-frame payload is one batched SE(3) pytree that
flows directly into the jitted render step.  Cross-host transport, where
needed, is a jax collective over the device mesh — not serialization.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

from sim_a_splat_tpu.ops.transforms import SE3


# geometry type codes — the drake lcmt_viewer_geometry_data enum values the
# reference's Geom adapter consumes (messaging/geom.py:6-48)
GEOM_BOX = 1
GEOM_SPHERE = 2
GEOM_CYLINDER = 3
GEOM_MESH = 4


@dataclasses.dataclass(frozen=True)
class GeomSchema:
    """Static declaration of one visual geometry attached to a link — the
    ``lcmt_viewer_geometry_data`` / ``Geom`` analogue (reference
    messaging/geom.py:6-48: name, position, quaternion, color + the
    underlying message's type/string_data/float_data).

    ``position``/``quaternion`` are the geometry's fixed offset in the LINK
    frame; ``float_data`` carries the primitive dimensions (box x/y/z,
    sphere r, cylinder r/l) or the mesh scale; ``string_data`` is the mesh
    path for GEOM_MESH."""

    name: str
    type: int                       # GEOM_* code
    position: tuple = (0.0, 0.0, 0.0)
    quaternion: tuple = (1.0, 0.0, 0.0, 0.0)   # wxyz
    color: tuple = (0.7, 0.7, 0.7, 1.0)        # rgba
    string_data: str = ""
    float_data: tuple = ()


@dataclasses.dataclass(frozen=True)
class LinkSchema:
    """Static declaration of one drawable body (``lcmt_viewer_link_data``
    analogue; messaging/link.py:8-33).  ``robot_num`` keeps the reference's
    model-instance numbering (robot=3, task object=2; splat_handler.py:58);
    ``geoms`` the per-link geometry records (link.py's ``num_geom`` +
    geometry_data array)."""

    name: str
    robot_num: int
    geoms: tuple = ()


@dataclasses.dataclass(frozen=True)
class SceneSchema:
    """The ``lcmt_viewer_load_robot`` analogue: ordered link declarations.

    Index i in the schema corresponds to index i of ``DrawState.poses``.
    """

    links: tuple

    @property
    def names(self) -> tuple:
        return tuple(l.name for l in self.links)

    def index_of(self, name: str) -> int:
        return self.names.index(name)


class DrawState(NamedTuple):
    """Per-frame body poses (``lcmt_viewer_draw`` analogue): one batched
    SE(3), ordered as the schema."""

    poses: SE3   # (L,) batched


ROBOT_NUM_TASK = 2   # reference blk_idx (splat_handler.py:58)
ROBOT_NUM_ROBOT = 3  # reference rbt_idx
