import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; bench.py uses the real chip.  The image's
# sitecustomize force-registers the axon TPU backend and pins the platform,
# so override via jax.config (env vars alone are not honored).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
