"""Geom schema + URDF mesh overlay (reference splat_handler.py:145-219,
messaging/geom.py:6-48)."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.messaging import (
    GEOM_BOX, GEOM_CYLINDER, GEOM_SPHERE, GeomSchema,
)
from sim_a_splat_tpu.ops import Camera, SE3
from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig, rasterize
from sim_a_splat_tpu.physics import kinematics as kin
from sim_a_splat_tpu.scenegraph import (
    overlay_frame_poses, urdf_overlay_graph, visual_mesh,
)
import pytest

REPO = Path(__file__).resolve().parent.parent
SCARA = REPO / "robot_description/pushscara3/urdf/pushscara3.urdf"
ARM5 = REPO / "robot_description/pusharm5/urdf/pusharm5.urdf"


def test_urdf_visuals_parsed():
    c = kin.load_chain(SCARA)
    by_name = dict(zip(c.link_names, c.visuals))
    v = by_name["link1"]
    assert v.geom_type == "box"
    np.testing.assert_allclose(v.size, (0.27, 0.06, 0.04))
    np.testing.assert_allclose(v.color, (0.15, 0.55, 0.55, 1.0))
    np.testing.assert_allclose(v.origin_xyz, (0.125, 0, 0))
    assert by_name["base_link"].geom_type == "cylinder"
    assert by_name["push_tool"].geom_type == "sphere"


def test_geom_schema_from_env():
    from sim_a_splat_tpu.envs.manipulator_envs import ManipulatorEnvF

    env = ManipulatorEnvF(chain=kin.load_chain(ARM5), eef_link="push_tool")
    schema = env.schema()
    robot_links = [l for l in schema.links if l.robot_num == 3]
    assert all(len(l.geoms) == 1 for l in robot_links)
    g = robot_links[0].geoms[0]
    assert isinstance(g, GeomSchema)
    assert g.type == GEOM_CYLINDER
    assert len(g.float_data) == 2            # (radius, length)
    task = [l for l in schema.links if l.robot_num == 2]
    assert task and task[0].geoms[0].color[:3] == (0.956, 0.396, 0.365)


def test_visual_mesh_shapes():
    c = kin.load_chain(SCARA)
    by_name = dict(zip(c.link_names, c.visuals))
    m = visual_mesh(by_name["link1"])        # box 0.27x0.06x0.04 at x=0.125
    lo, hi = m.vertices.min(0), m.vertices.max(0)
    np.testing.assert_allclose(hi - lo, [0.27, 0.06, 0.04], atol=1e-9)
    np.testing.assert_allclose((hi + lo) / 2, [0.125, 0, 0], atol=1e-9)


def test_overlay_graph_moves_with_fk():
    c = kin.load_chain(SCARA)
    q0 = jnp.zeros(3)
    overlay = urdf_overlay_graph(c, q0, n_per_link=50)
    assert overlay is not None
    n = overlay.scene.num_gaussians
    assert n == 50 * 5                        # five links with visuals
    # at rest config the posed scene equals the stored scene
    posed0 = overlay.posed(overlay_frame_poses(c, q0))
    np.testing.assert_allclose(np.asarray(posed0.means),
                               np.asarray(overlay.scene.means), atol=1e-5)
    # rotating the shoulder sweeps link1+ gaussians but not the base
    q1 = jnp.asarray([np.pi / 2, 0.0, 0.0])
    posed1 = overlay.posed(overlay_frame_poses(c, q1))
    ids = np.asarray(overlay.link_ids)
    base_id = 1 + c.link_index("base_link")
    link1_id = 1 + c.link_index("link1")
    m_base = ids == base_id
    m_l1 = ids == link1_id
    np.testing.assert_allclose(np.asarray(posed1.means[m_base]),
                               np.asarray(overlay.scene.means[m_base]),
                               atol=1e-5)
    d = np.abs(np.asarray(posed1.means[m_l1])
               - np.asarray(overlay.scene.means[m_l1])).max()
    assert d > 0.05


@pytest.mark.slow
def test_overlay_renders():
    c = kin.load_chain(ARM5)
    overlay = urdf_overlay_graph(c, jnp.zeros(5), n_per_link=40)
    cam = Camera.from_fov(
        SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.3, -1.5])),
        0.9, 48, 48)
    cfg = RasterConfig(tile_size=16, tile_capacity=128,
                       max_tiles_per_gaussian=9, chunk=64, sigma_cutoff=3.0)
    s = overlay.posed(overlay_frame_poses(c, jnp.asarray([0.3, 0.4, -0.2,
                                                          0.1, 0.0])))
    img, _ = rasterize(s.means, s.covs(), s.colors_dc(), s.opacities(),
                       cam, cfg)
    assert np.isfinite(np.asarray(img)).all()
    assert float(jnp.abs(img).max()) > 0.01
