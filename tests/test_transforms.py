import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sim_a_splat_tpu.ops.transforms import SE3, Sim3
from sim_a_splat_tpu.ops import quaternion as quat


def _rand_se3(seed=0, batch=()):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=batch + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=batch + (3,))
    return SE3(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))


def test_compose_inverse_identity():
    T = _rand_se3(0, (8,))
    I = T.compose(T.inverse())
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(I.apply(x)), np.asarray(x), atol=1e-5)


def test_matrix_roundtrip():
    T = _rand_se3(2, (4,))
    M = T.as_matrix()
    T2 = SE3.from_matrix(M)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(T.apply(x)), np.asarray(T2.apply(x)), atol=1e-5)


def test_apply_matches_matrix():
    T = _rand_se3(4)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(16, 3)), jnp.float32)
    M = np.asarray(T.as_matrix())
    expect = x @ M[:3, :3].T + M[:3, 3]
    np.testing.assert_allclose(np.asarray(T.apply(x)), expect, atol=1e-5)


def test_se3_is_pytree():
    T = _rand_se3(6, (4,))
    leaves = jax.tree_util.tree_leaves(T)
    assert len(leaves) == 2
    T2 = jax.jit(lambda t: t.compose(t))(T)
    assert T2.q.shape == (4, 4)


def test_sim3_factor_out_matches_reference_semantics():
    # build s*R | t like an ICP similarity output (splat_handler.py:71-83)
    rng = np.random.default_rng(7)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(quat.to_rotation_matrix(jnp.asarray(q, jnp.float32)))
    s, t = 0.2112, np.array([0.3, -0.1, 0.7])
    M = np.eye(4)
    M[:3, :3] = s * R
    M[:3, 3] = t
    sim = Sim3.from_matrix(M)
    assert abs(float(sim.s) - s) < 1e-5
    x = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    expect = (np.asarray(x) @ (s * R).T) + t
    np.testing.assert_allclose(np.asarray(sim.apply(x)), expect, atol=1e-4)
    # rigid part drops the scale
    expect_rigid = (np.asarray(x) @ R.T) + t
    np.testing.assert_allclose(np.asarray(sim.se3().apply(x)), expect_rigid, atol=1e-4)


def test_sim3_rejects_nonsimilarity():
    M = np.eye(4)
    M[0, 0] = 2.0  # anisotropic
    with pytest.raises(ValueError):
        Sim3.from_matrix(M)
