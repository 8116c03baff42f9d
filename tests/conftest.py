import os

# Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
# exercised without TPU hardware (see SURVEY.md §4).  XLA_FLAGS must be set
# before the backend initializes.  The axon sitecustomize force-registers the
# TPU platform, so the platform is pinned via jax.config after import.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = xla_flags.strip()

# NOTE on process hygiene: this jaxlib's (0.9.0) CPU backend crashes
# (SIGSEGV or SIGABRT) when a single process loads its ~150-160th compiled
# executable — reproduced 4x at different tests, in backend_compile AND in
# the persistent-cache *read* path, with every crashing test passing in a
# fresh process; serializing LLVM codegen did not help.  The suite
# therefore runs under pytest-xdist (pyproject addopts: -n 4 --dist
# loadfile) so each worker stays well below that executable count.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache, SEPARATE from the TPU/axon bench cache
# (/tmp/trt_jax_cache — whose entries are compiled on the axon server with
# different host CPU features and trip cpu_aot_loader feature checks).
jax.config.update("jax_compilation_cache_dir", "/tmp/trt_jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert len(jax.devices()) == 8, jax.devices()
