"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding tests use jax.sharding.Mesh over these virtual devices;
real-TPU benchmarking happens in bench.py, not in tests.
"""

import os

# force CPU: the ambient environment pins JAX_PLATFORMS to the real
# accelerator, which would serialize test jobs on the device tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the config API wins over the (externally pinned) env var
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the SLAM system compiles a family of
# bucket-shaped kernels; cache them across test runs. The dir is
# fingerprinted by the HOST CPU: XLA:CPU AOT executables compiled on a
# different machine (earlier build hosts shared the repo's .jax_cache)
# load with unsupported instruction sets and SIGSEGV/SIGILL mid-suite
# (cpu_aot_loader machine-feature warnings escalating to a segfault in
# test_system_smoke, observed round 5).
import hashlib


def _cpu_fingerprint():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


cache_dir = os.path.join(os.path.dirname(__file__), "..",
                         f".jax_cache_cpu_{_cpu_fingerprint()}")
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
