import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is validated
# without TPU hardware, and float64 is available for numerical parity checks.
# Note: the environment's sitecustomize pre-registers the TPU backend with
# JAX_PLATFORMS=axon, so we must override via jax.config, not env vars.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# XLA:CPU AOT cache entries are host-CPU-feature specific; a shared cache dir
# reused across machines can SIGILL.  Key the test cache by host name.
import platform  # noqa: E402

os.environ.setdefault(
    "SPAMTREE_COMPILE_CACHE",
    os.path.expanduser(f"~/.cache/spamtree_tpu_xla_cpu_{platform.node()}"),
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
