"""Real multi-process jax.distributed test (VERDICT r1 weak #6 / next #7).

Two OS processes, localhost coordinator, 2 virtual CPU devices each → a
4-device global mesh.  Each process holds its local shard of an env-sharded
pushT batch and runs a jitted vmapped control step whose batch-mean reward
is a true cross-process collective.  Asserts both processes agree on the
reduced scalar and that it matches a single-process run of the same batch.

Also covers the failure-reporting contract of ``initialize_distributed``:
explicit-but-broken configuration must raise, not silently degrade.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

_WORKER = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from sim_a_splat_tpu.parallel.mesh import (
    initialize_distributed, make_mesh, env_sharding, replicated)

coord, pid = sys.argv[1], int(sys.argv[2])
ok = initialize_distributed(
    coordinator_address=coord, num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2, (ok, jax.process_count())
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
from sim_a_splat_tpu.physics import pusht
from sim_a_splat_tpu.physics.pusht import PushTParams

P = PushTParams()
mesh = make_mesh(env=4)
B = 8

# identical global batch on both processes; each contributes its local shard
keys = jax.random.split(jax.random.key(0), B)
local = jax.vmap(lambda k: pusht.sample_reset_state(P, k))(keys)
local = np.asarray(local)
sh = env_sharding(mesh)
global_states = jax.make_array_from_process_local_data(
    sh, local[pid * (B // 2):(pid + 1) * (B // 2)], global_shape=(B, 5))

def one(vec):
    st = pusht.set_state(P, vec)
    st = pusht.control_step(P, st, jnp.asarray([150.0, 250.0]))
    r, _ = pusht.reward_done(P, st)
    return r, st.block_pos

@jax.jit
def run(vecs):
    r, bp = jax.vmap(one)(vecs)
    return jnp.mean(r), jnp.mean(bp)   # cross-process reduction

mean_r, mean_bp = jax.jit(
    run, in_shardings=sh, out_shardings=replicated(mesh))(global_states)
print("RESULT " + json.dumps(
    {"pid": pid, "mean_r": float(mean_r), "mean_bp": float(mean_bp)}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_env_sharded_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": str(REPO),
    })
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen([sys.executable, str(worker), coord, str(pid)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT in worker output:\n{out}"
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r
    assert set(results) == {0, 1}
    np.testing.assert_allclose(results[0]["mean_r"], results[1]["mean_r"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["mean_bp"], results[1]["mean_bp"],
                               rtol=1e-6)

    # cross-check vs single-process execution of the same global batch
    import jax
    import jax.numpy as jnp
    from sim_a_splat_tpu.physics import pusht
    from sim_a_splat_tpu.physics.pusht import PushTParams

    P = PushTParams()
    keys = jax.random.split(jax.random.key(0), 8)
    vecs = jax.vmap(lambda k: pusht.sample_reset_state(P, k))(keys)

    def one(vec):
        st = pusht.set_state(P, vec)
        st = pusht.control_step(P, st, jnp.asarray([150.0, 250.0]))
        r, _ = pusht.reward_done(P, st)
        return r, st.block_pos

    r, bp = jax.jit(jax.vmap(one))(vecs)
    np.testing.assert_allclose(results[0]["mean_r"], float(jnp.mean(r)),
                               rtol=1e-5)
    np.testing.assert_allclose(results[0]["mean_bp"], float(jnp.mean(bp)),
                               rtol=1e-5)


def test_initialize_distributed_reports_explicit_failures():
    """Broken explicit config must raise (not silently fall back).

    An *unreachable* coordinator cannot be used to probe this: the XLA
    coordination client terminates the process with an absl FATAL on
    connect timeout instead of raising.  An inconsistent partial config
    (coordinator given, process count/id missing) fails at the Python
    layer and must surface as our RuntimeError, never be swallowed.
    """
    script = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from sim_a_splat_tpu.parallel.mesh import initialize_distributed\n"
        "try:\n"
        "    initialize_distributed(coordinator_address='127.0.0.1:1')\n"
        "except RuntimeError as e:\n"
        "    print('RAISED_OK')\n"
    )
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)})
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=120)
    assert "RAISED_OK" in out.stdout, out.stdout + out.stderr
