import os

# CPU with 8 virtual devices: tests must not depend on TPU hardware, and
# distributed tests simulate a mesh (SURVEY.md §4).  NOTE: the axon TPU
# plugin in this image ignores the JAX_PLATFORMS *env var*, so the
# platform must be pinned via jax.config before any backend use.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
