import os

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding without
# chips). NOTE: the environment presets JAX_PLATFORMS=axon (real TPU tunnel)
# and the axon plugin IGNORES JAX_PLATFORMS=cpu — only JAX_PLATFORM_NAME
# reliably forces the CPU backend here. Eager (non-jit) ops through the
# tunnel are pathologically slow, so getting this wrong makes tests crawl.
os.environ.pop("JAX_PLATFORMS", None)
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
