"""Test harness config: force an 8-virtual-device CPU mesh so sharding and
collective paths are exercised without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize force-registers a remote-TPU ('axon')
backend and overrides JAX_PLATFORMS, so the env var alone is not enough —
we must also flip jax.config after import. Every tiny dispatch to the
tunneled TPU pays network latency, which would make the test suite ~100x
slower (measured).
"""

import os

# Must run before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the model graphs compile once per machine,
# not once per pytest invocation (CPU compiles of the full model are ~30-90s).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

# Build the native CSV parser once per session so its parity test runs
# instead of skipping (VERDICT r3 weak #6). ~2 s of g++; skipped only if
# the toolchain itself is absent.
def _build_native_parser():
    from desire_tpu.data.native import build, fast_csv
    if fast_csv.available():
        return
    try:
        build.build(verbose=False)
        fast_csv._lib = None  # force re-probe of the fresh .so
    except Exception:
        pass  # the parity test will skip with its own message


_build_native_parser()
