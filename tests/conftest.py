import os
import sys

# Tests run on a virtual 8-device CPU mesh: sharding logic is validated
# without TPU hardware; bench.py runs on the real chip instead.
# NOTE: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) and the
# plugin ignores the env var, so the platform must be forced via
# jax.config before any backend initialization.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))
