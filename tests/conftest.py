"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware per SURVEY.md §4:
``--xla_force_host_platform_device_count=8`` + CPU platform.  The ambient
environment pins JAX_PLATFORMS=axon (a tunneled TPU with ~0.3 s/dispatch
round-trip latency) which would make unit tests crawl — and the axon plugin
wins over the env var — so we force CPU through jax.config, which does take
precedence.  Must happen before any backend is initialized, hence
module-level in conftest.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# the suite is XLA-CPU-compile-bound: persist compiled executables across
# runs (first run warms ~everything; repeat runs are mostly dispatch)
try:
    from pathlib import Path

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass
