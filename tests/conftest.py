"""Test configuration: force an 8-device virtual CPU platform before the JAX
backend initializes, so multi-chip sharding tests run without TPU hardware
(the standard JAX idiom; see SURVEY.md 4).

Note: some installed packages register pytest plugins that import jax before
this conftest runs, so setting os.environ alone is not enough — we also set
the config knobs, which take effect as long as no backend has been created.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# XLA compiles have multi-second fixed overhead in this environment; the
# persistent cache amortizes them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert "jax" not in sys.modules or len(jax.devices()) == 8, (
    "JAX backend initialized before conftest could force the 8-device CPU platform")
