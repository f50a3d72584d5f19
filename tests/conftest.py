import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-shard logic is exercised
# without TPU hardware.  The environment may preload jax with a TPU platform
# (JAX_PLATFORMS=axon via sitecustomize), so env vars alone are not enough:
# override through jax.config before the backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
