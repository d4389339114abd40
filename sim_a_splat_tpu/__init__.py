"""sim_a_splat_tpu — a TPU-native simulation-in-a-Gaussian-splat framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``sim_a_splat`` package (physics simulator driving per-link subsets of a
pre-trained Gaussian splat to produce photorealistic camera observations in
Gymnasium-style environments; reference layer map: sim_a_splat/__init__.py:1-18).

Everything the reference does with five processes (Python, Drake C++, two
browser renderers, optional ROS) is here one jitted program over pytrees:

- :mod:`sim_a_splat_tpu.splat`      Gaussian scene pytrees + loaders
- :mod:`sim_a_splat_tpu.ops`        math + differentiable rasterizer (Pallas/XLA)
- :mod:`sim_a_splat_tpu.scenegraph` per-link splat subsets + similarity-conjugated poses
- :mod:`sim_a_splat_tpu.physics`    pure-JAX pushT / articulated-arm physics
- :mod:`sim_a_splat_tpu.envs`       functional env API + Gymnasium adapters
- :mod:`sim_a_splat_tpu.parallel`   device-mesh sharding (pjit/shard_map)
- :mod:`sim_a_splat_tpu.messaging`  typed pose structs (the LCM-schema analogue)
"""

from sim_a_splat_tpu import ops, splat, scenegraph, physics, envs, parallel, messaging, utils

__version__ = "0.1.0"

__all__ = [
    "ops",
    "splat",
    "scenegraph",
    "physics",
    "envs",
    "parallel",
    "messaging",
    "utils",
    "__version__",
]
