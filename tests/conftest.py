"""Test harness config: run on CPU with 8 virtual devices.

Tests never require a TPU — the multi-chip sharding tests use the fake CPU
mesh (SURVEY.md §4 item 5). Set PHYSICS_TPU_TEST_TPU=1 to run the suite on
an attached TPU instead (exercises the Pallas kernels and the
backend-gated fast paths).

Note: this environment's sitecustomize imports jax at interpreter startup
(pinning JAX_PLATFORMS from the shell env), so setting os.environ here is
too late for the platform choice — but jax.config.update works until the
first backend initialization, and XLA_FLAGS is read at backend-client
creation, which also hasn't happened yet.
"""

import os

_USE_TPU = os.environ.get("PHYSICS_TPU_TEST_TPU") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # This environment's sitecustomize registers the remote-TPU PJRT
    # plugin whenever PALLAS_AXON_POOL_IPS is set — and backend INIT
    # (not registration) dials the tunnel and can block indefinitely
    # when it is unhealthy, even under JAX_PLATFORMS=cpu. The parent
    # process is already protected by jax.config.update below; popping
    # the var here makes the env inherited by SUBPROCESS-based tests
    # (test_boxes_only_path, test_hullhull fast-parity) tunnel-immune:
    # their fresh interpreters skip the registration entirely.
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the interpreted Pallas kernels produce
# large unrolled XLA:CPU graphs whose cold compiles dominate suite wall
# time (a single table-path step compiles ~70 s cold, ~13 s cached on
# this class of machine). The cache survives across runs/rounds; set
# PHYSICS_TPU_NO_CACHE=1 to measure true cold-compile time.
if os.environ.get("PHYSICS_TPU_NO_CACHE") != "1":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/root/.jax_cache_cpu" if not _USE_TPU
                       else "/root/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
