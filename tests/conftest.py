import os
import sys

# Run the test-suite on a virtual 8-device CPU mesh so multi-chip sharding
# paths compile and execute without TPU hardware.
#
# The CI image's sitecustomize imports jax at interpreter start and presets
# JAX_PLATFORMS=axon (the TPU tunnel), so env vars alone are too late -
# override through the live config instead.  XLA_FLAGS is still read lazily
# at first CPU-backend initialisation, which has not happened yet.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
