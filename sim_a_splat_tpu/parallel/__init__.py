"""Device-mesh parallelism: env sharding, sharded rendering, train steps."""

from sim_a_splat_tpu.parallel.mesh import (
    ENV_AXIS, PRIM_AXIS, env_sharding, initialize_distributed, make_mesh,
    prim_sharding, replicate, replicated, shard_batch,
)
from sim_a_splat_tpu.parallel.render_sharding import (
    rasterize_sharded, rasterize_sharded_sh,
)
from sim_a_splat_tpu.parallel.rollout import (
    make_rollout, make_train_step, shard_vmap,
)

__all__ = [
    "ENV_AXIS", "PRIM_AXIS", "env_sharding", "initialize_distributed",
    "make_mesh", "prim_sharding", "replicate", "replicated", "shard_batch",
    "rasterize_sharded", "rasterize_sharded_sh",
    "make_rollout", "make_train_step", "shard_vmap",
]
