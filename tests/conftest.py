"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference exercises distributed code paths only on real multi-GPU jobs
(SURVEY.md §4); here we simulate 8 devices on CPU so sharding/collective
logic is tested on every run.
"""

import os

# Force CPU even when the environment preselects a TPU platform (e.g.
# JAX_PLATFORMS=axon, re-exported by a sitecustomize so the env var alone is
# not enough — see the jax.config.update below): the suite must always see
# the virtual 8-device mesh. Set SIPMASK_TEST_PLATFORM to override (e.g. to
# run op tests on real TPU).
_platform = os.environ.get("SIPMASK_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# JAX's default matmul precision truncates inputs (bf16-style) even on CPU;
# parity tests need exact fp32 accumulation. (The env var is not honored in
# this JAX version, so use the config API.)
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: model tests compile big graphs; cache them
# across runs (repo-local, gitignored)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
