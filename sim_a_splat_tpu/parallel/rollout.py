"""Sharded batched-env rollouts and gradient synchronization.

The production datagen path (BASELINE.md north star): B environments vmapped
within a chip and sharded over the mesh ``env`` axis; each device steps and
renders its own env shard, so the hot loop has **zero** cross-device
communication — collectives appear only for gradient sync (`psum` over the
mesh) and metrics.  This is the TPU-native replacement for the reference's
one-process-one-env interactive loop (SURVEY.md §2.2).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sim_a_splat_tpu.parallel.mesh import ENV_AXIS, env_sharding, replicated


def shard_vmap(f: Callable, mesh: Mesh, donate: bool = False):
    """``jit(vmap(f))`` with batch-leading inputs/outputs sharded over the
    env axis.  The compiled function is SPMD: on a pod each process passes
    its global-batch arrays and XLA executes shard-local with no collectives.
    """
    s = env_sharding(mesh)
    return jax.jit(jax.vmap(f), in_shardings=s, out_shardings=s,
                   donate_argnums=(0,) if donate else ())


def make_rollout(step_fn: Callable, mesh: Mesh, horizon: int):
    """Compile a ``horizon``-step batched rollout.

    ``step_fn(state, action) -> (state, per_step_outputs)`` is the
    single-env transition; actions are (horizon, B, ...) and outputs are
    stacked (horizon, B, ...).  States stay sharded over ``env`` across the
    whole scan — one compilation, no host round-trips per step.
    """
    batched = jax.vmap(step_fn)

    def rollout(states, actions):
        def body(s, a):
            return batched(s, a)
        return jax.lax.scan(body, states, actions)

    s_env = env_sharding(mesh)
    return jax.jit(
        rollout,
        in_shardings=(s_env, NamedSharding(mesh, P(None, ENV_AXIS))),
        out_shardings=(s_env, NamedSharding(mesh, P(None, ENV_AXIS))),
    )


def make_train_step(loss_fn: Callable, optimizer, mesh: Mesh):
    """Data-parallel train step: params replicated, batch env-sharded,
    gradient mean implicit in the SPMD reduction of the batch loss.

    ``loss_fn(params, batch) -> scalar`` must average over the batch axis;
    with batch sharded over ``env`` and params replicated, XLA inserts the
    gradient all-reduce automatically and overlaps it with backward compute
    (the "overlapped grad all-reduce" of SURVEY.md §7).
    """
    import optax

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    s_env = env_sharding(mesh)
    s_rep = replicated(mesh)
    return jax.jit(step,
                   in_shardings=(s_rep, s_rep, s_env),
                   out_shardings=(s_rep, s_rep, s_rep),
                   donate_argnums=(0, 1))
