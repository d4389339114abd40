import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from sim_a_splat_tpu.ops import quaternion as quat


def _rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _scipy_R(q_wxyz):
    return Rotation.from_quat(np.roll(q_wxyz, -1, axis=-1)).as_matrix()


def test_to_rotation_matrix_matches_scipy():
    q = _rand_quats(64)
    R = np.asarray(quat.to_rotation_matrix(jnp.asarray(q, jnp.float32)))
    np.testing.assert_allclose(R, _scipy_R(q), atol=1e-5)


def test_unnormalized_input_is_normalized():
    q = _rand_quats(16) * 3.7
    R = np.asarray(quat.to_rotation_matrix(jnp.asarray(q, jnp.float32)))
    np.testing.assert_allclose(R, _scipy_R(q / 3.7), atol=1e-5)


def test_from_rotation_matrix_roundtrip():
    q = _rand_quats(128, seed=3)
    R = _scipy_R(q)
    q2 = np.asarray(quat.from_rotation_matrix(jnp.asarray(R, jnp.float32)))
    # same rotation up to sign
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_identity_and_axis_rotations():
    # exact special cases incl. the w≈0 branch
    cases = np.array([
        [1, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
        [np.sqrt(0.5), np.sqrt(0.5), 0, 0],
    ])
    R = np.asarray(quat.to_rotation_matrix(jnp.asarray(cases, jnp.float32)))
    np.testing.assert_allclose(R, _scipy_R(cases), atol=1e-6)
    q2 = np.asarray(quat.from_rotation_matrix(jnp.asarray(R, jnp.float32)))
    dot = np.abs(np.sum(cases * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_multiply_matches_matrix_product():
    qa, qb = _rand_quats(32, 1), _rand_quats(32, 2)
    qc = np.asarray(quat.multiply(jnp.asarray(qa, jnp.float32), jnp.asarray(qb, jnp.float32)))
    np.testing.assert_allclose(_scipy_R(qc), _scipy_R(qa) @ _scipy_R(qb), atol=1e-5)


def test_rotate_matches_matrix():
    q = _rand_quats(32, 5)
    v = np.random.default_rng(6).normal(size=(32, 3))
    out = np.asarray(quat.rotate(jnp.asarray(q, jnp.float32), jnp.asarray(v, jnp.float32)))
    expect = np.einsum("nij,nj->ni", _scipy_R(q), v)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_rpy_roundtrip_and_drake_convention():
    rng = np.random.default_rng(7)
    rpy = rng.uniform(-1.4, 1.4, (32, 3))
    q = np.asarray(quat.from_rpy(jnp.asarray(rpy, jnp.float32)))
    # Drake RollPitchYaw: R = Rz(y) Ry(p) Rx(r) == scipy euler "xyz" extrinsic
    expect = Rotation.from_euler("xyz", rpy).as_matrix()
    np.testing.assert_allclose(_scipy_R(q), expect, atol=1e-5)
    rpy2 = np.asarray(quat.to_rpy(jnp.asarray(q, jnp.float32)))
    np.testing.assert_allclose(rpy2, rpy, atol=1e-4)


def test_angle_axis_roundtrip_matches_scipy():
    q = _rand_quats(64, 9)
    aa = np.asarray(quat.to_angle_axis(jnp.asarray(q, jnp.float32)))
    expect = Rotation.from_quat(np.roll(q, -1, axis=-1)).as_rotvec()
    # rotvec is defined up to 2π wrapping with opposite axis; compare matrices
    np.testing.assert_allclose(
        Rotation.from_rotvec(aa).as_matrix(),
        Rotation.from_rotvec(expect).as_matrix(), atol=1e-5)
    q2 = np.asarray(quat.from_angle_axis(jnp.asarray(aa, jnp.float32)))
    np.testing.assert_allclose(_scipy_R(q2), _scipy_R(q), atol=1e-5)


def test_angle_axis_small_angle():
    aa = np.asarray([[1e-9, -2e-9, 3e-10], [0.0, 0.0, 0.0]], np.float32)
    R = np.asarray(quat.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-7)
    q = np.asarray(quat.from_angle_axis(jnp.asarray(aa)))
    assert np.all(np.isfinite(q))
    np.testing.assert_allclose(q[1], [1, 0, 0, 0], atol=1e-7)
    back = np.asarray(quat.to_angle_axis(jnp.asarray(q)))
    assert np.all(np.isfinite(back))


def test_angle_axis_to_rotation_matrix_matches_scipy():
    rng = np.random.default_rng(11)
    aa = rng.normal(size=(48, 3)) * 1.5
    R = np.asarray(quat.angle_axis_to_rotation_matrix(jnp.asarray(aa, jnp.float32)))
    np.testing.assert_allclose(R, Rotation.from_rotvec(aa).as_matrix(), atol=1e-5)
