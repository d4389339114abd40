"""pushT planar physics: analytic checks + Chipmunk-semantic invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.physics import planar
from sim_a_splat_tpu.physics import pusht
from sim_a_splat_tpu.physics.pusht import PushTParams, PushTState
import pytest

P = PushTParams()


def settled(agent=(60.0, 60.0), block=(149.0, 256.0), angle=0.0):
    return pusht.set_state(
        P, jnp.asarray([*agent, *block, angle], jnp.float32))


# --- planar primitives -------------------------------------------------------

def test_moment_for_poly_rectangle():
    # rect 120×30 with centroid at (0, 15): parallel-axis about origin
    v = [(-60, 30), (60, 30), (60, 0), (-60, 0)]
    expect = (120**2 + 30**2) / 12 + 15**2
    assert abs(planar.moment_for_poly(1.0, v) - expect) < 1e-9


def test_clip_area_analytic():
    sq = jnp.asarray([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    np.testing.assert_allclose(float(planar.convex_clip_area(sq, sq)), 1.0,
                               atol=1e-6)
    shifted = sq + jnp.asarray([0.5, 0.0])
    np.testing.assert_allclose(float(planar.convex_clip_area(sq, shifted)),
                               0.5, atol=1e-6)
    far = sq + jnp.asarray([5.0, 5.0])
    np.testing.assert_allclose(float(planar.convex_clip_area(sq, far)), 0.0,
                               atol=1e-6)
    # 45°-rotated unit square over unit square: intersection is an octagon-ish
    # region; verify against dense Monte Carlo
    c, s = np.cos(0.7), np.sin(0.7)
    R = jnp.asarray([[c, -s], [s, c]], jnp.float32)
    rot = (sq - 0.5) @ R.T + 0.5
    area = float(planar.convex_clip_area(sq, rot))
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (200_000, 2))
    local = (pts - 0.5) @ np.asarray(R)  # inverse rotation (R orthonormal)
    inside = np.all(np.abs(local) <= 0.5, axis=1)
    np.testing.assert_allclose(area, inside.mean(), atol=3e-3)


def test_clip_area_differentiable():
    sq = jnp.asarray([[0.0, 0], [1, 0], [1, 1], [0, 1]])

    def f(dx):
        return planar.convex_clip_area(sq, sq + jnp.stack([dx, 0.0 * dx]))

    g = jax.grad(f)(0.3)
    np.testing.assert_allclose(float(g), -1.0, atol=1e-4)  # d(1-dx)/ddx


def test_circle_poly_contact_geometry():
    poly = jnp.asarray([[0.0, 0], [10, 0], [10, 10], [0, 10]])[::-1]  # CCW? no
    # CCW winding (positive shoelace): counter-clockwise square
    poly = jnp.asarray([[0.0, 0], [10, 0], [10, 10], [0, 10]])
    c = planar.circle_poly_contact(jnp.asarray([15.0, 5.0]), 6.0, poly,
                                   jnp.zeros(2), 1.0)
    assert bool(c.active)
    np.testing.assert_allclose(np.asarray(c.normal), [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(float(c.depth), 1.0, atol=1e-6)
    # circle fully away → inactive
    c2 = planar.circle_poly_contact(jnp.asarray([30.0, 5.0]), 6.0, poly,
                                    jnp.zeros(2), 1.0)
    assert not bool(c2.active)


# --- task dynamics -----------------------------------------------------------

def test_coverage_one_at_goal():
    st = settled(block=(float(P.goal_x), float(P.goal_y)),
                 angle=float(P.goal_theta))
    cov = float(pusht.coverage(P, st))
    np.testing.assert_allclose(cov, 1.0, atol=1e-4)
    r, d = pusht.reward_done(P, st)
    assert float(r) == 1.0 and bool(d)


def test_coverage_zero_far_away():
    st = settled(block=(60.0, 60.0), angle=0.3)
    assert float(pusht.coverage(P, st)) < 1e-6


def test_block_static_without_contact():
    st = settled(agent=(60.0, 400.0), block=(149.0, 256.0), angle=0.5)
    step = jax.jit(lambda s, a: pusht.control_step(P, s, a))
    s1 = step(st, jnp.asarray([60.0, 400.0]))
    np.testing.assert_allclose(np.asarray(s1.block_pos),
                               np.asarray(st.block_pos), atol=1e-5)
    np.testing.assert_allclose(float(s1.block_angle),
                               float(st.block_angle), atol=1e-6)
    assert int(s1.n_contacts) == 0


def test_agent_pd_converges_to_target():
    st = settled(agent=(60.0, 60.0), block=(250.0, 450.0))
    target = jnp.asarray([120.0, 100.0])
    step = jax.jit(lambda s: pusht.control_step(P, s, target))
    for _ in range(30):   # 3 s
        st = step(st)
    np.testing.assert_allclose(np.asarray(st.agent_pos), np.asarray(target),
                               atol=1.0)


def test_push_moves_block_quasi_statically():
    # agent left of the T stem, drive right through it: block must move right
    st = settled(agent=(80.0, 310.0), block=(149.0, 256.0), angle=0.0)
    x0 = float(st.block_pos[0])
    step = jax.jit(lambda s, a: pusht.control_step(P, s, a))
    for i in range(20):
        st = step(st, jnp.asarray([80.0 + 6.0 * i, 310.0]))
    assert float(st.block_pos[0]) > x0 + 10.0
    assert int(st.n_contacts) > 0
    # quasi-static (damping 0): once the agent holds still the block stops
    hold = st.agent_pos
    st2 = step(st, hold)
    st3 = step(st2, hold)
    np.testing.assert_allclose(np.asarray(st3.block_pos),
                               np.asarray(st2.block_pos), atol=0.2)


def test_off_center_push_rotates_block():
    # push the crossbar near its end → torque about the CoG
    st = settled(agent=(80.0, 270.0), block=(149.0, 256.0), angle=0.0)
    step = jax.jit(lambda s, a: pusht.control_step(P, s, a))
    for i in range(15):
        st = step(st, jnp.asarray([80.0 + 6.0 * i, 270.0]))
    assert abs(float(st.block_angle)) > 0.05


@pytest.mark.slow
def test_block_cog_override_changes_rotation():
    """block_cog ctor override (reference pusht_env.py:97-99): moving the
    pivot point changes the torque of the same off-center push."""
    import dataclasses as dc
    # same local CoG as default → identical trajectory
    p_same = dc.replace(P, block_cog=tuple(
        np.asarray(pusht.tee_cog_local(P.scale, P.length), np.float64)))
    # CoG shifted to the crossbar's left end → different rotation
    p_shift = dc.replace(P, block_cog=(-50.0, 15.0))
    vec = jnp.asarray([80.0, 270.0, 149.0, 256.0, 0.0], jnp.float32)

    def rollout(params):
        st = pusht.set_state(params, vec)
        step = jax.jit(lambda s, a: pusht.control_step(params, s, a))
        for i in range(15):
            st = step(st, jnp.asarray([80.0 + 6.0 * i, 270.0]))
        return st

    base, same, shift = rollout(P), rollout(p_same), rollout(p_shift)
    np.testing.assert_allclose(float(same.block_angle),
                               float(base.block_angle), atol=1e-5)
    assert abs(float(shift.block_angle) - float(base.block_angle)) > 0.02


def test_walls_contain_block():
    # bulldoze the block into the left wall for 5 s: no tunneling
    st = settled(agent=(200.0, 256.0), block=(120.0, 256.0), angle=0.0)
    step = jax.jit(lambda s, a: pusht.control_step(P, s, a))
    for i in range(50):
        st = step(st, jnp.asarray([200.0 - 5.0 * i, 256.0]))
    polys = np.asarray(pusht.block_polys_world(P, st.block_pos, st.block_angle))
    assert polys[..., 0].min() > 3.0       # wall surface at 7 px, slop 0.1
    assert np.isfinite(np.asarray(st.block_pos)).all()


def test_set_state_legacy_order_differs():
    vec = jnp.asarray([60.0, 60.0, 200.0, 300.0, 1.0], jnp.float32)
    a = pusht.set_state(P, vec, legacy=False)
    b = pusht.set_state(P, vec, legacy=True)
    # non-legacy puts the body origin exactly at the requested position;
    # legacy rotated about the CoG afterwards, displacing the origin
    assert np.linalg.norm(np.asarray(a.block_pos) - np.asarray(b.block_pos)) > 5.0


def test_obs_layout_and_angle_wrap():
    st = settled(block=(200.0, 300.0), angle=-0.5)
    obs = np.asarray(pusht.get_obs(st))
    assert obs.shape == (5,)
    assert 0.0 <= obs[4] < 2 * np.pi


@pytest.mark.slow
def test_vmapped_batch_rollout():
    keys = jax.random.split(jax.random.key(0), 16)
    resets = jax.vmap(lambda k: pusht.reset(P, k))(keys)
    actions = jnp.tile(jnp.asarray([150.0, 250.0]), (16, 1))

    @jax.jit
    def rollout(states):
        def body(s, _):
            s = jax.vmap(lambda st, a: pusht.control_step(P, st, a))(s, actions)
            r, d = jax.vmap(lambda st: pusht.reward_done(P, st))(s)
            return s, (r, d)
        return jax.lax.scan(body, states, None, length=10)

    final, (r, d) = rollout(resets)
    assert r.shape == (10, 16)
    assert np.isfinite(np.asarray(final.block_pos)).all()
    assert np.isfinite(np.asarray(r)).all()


@pytest.mark.slow
def test_reward_differentiable_through_dynamics():
    st = settled(agent=(80.0, 310.0), block=(149.0, 256.0))

    def f(action):
        # one control step (10 contact substeps) is enough to pin
        # differentiability; a second step doubled the backward graph and
        # its CPU compile dominated the suite's wall time
        s = pusht.control_step(P, st, action)
        r, _ = pusht.reward_done(P, s)
        return r

    g = jax.grad(f)(jnp.asarray([140.0, 310.0]))
    assert np.isfinite(np.asarray(g)).all()
