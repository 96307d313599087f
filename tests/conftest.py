import os

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding without
# chips). NOTE: the axon plugin (sitecustomize) calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter startup, so
# platform-selection ENV VARS (JAX_PLATFORMS / JAX_PLATFORM_NAME) are
# ignored — the config value must be overridden programmatically below.
# Getting this wrong silently routes tests to the tunneled TPU, where eager
# ops crawl (minutes per op).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (XLA_FLAGS above must be set before first use)

jax.config.update("jax_platforms", "cpu")

# The CPU backend executes fp32 matmuls at bf16 precision by default
# (measured: |jnp.dot - np.dot| ~ 8e-3 on unit-scale inputs), which defeats
# numerical tests — especially the torch logit-parity suite. Force true fp32.
jax.config.update("jax_default_matmul_precision", "highest")
