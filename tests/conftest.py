import os

# Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
# exercised without TPU hardware (see SURVEY.md §4).  XLA_FLAGS must be set
# before the backend initializes.  The axon sitecustomize force-registers the
# TPU platform, so the platform is pinned via jax.config after import.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, jax.devices()
