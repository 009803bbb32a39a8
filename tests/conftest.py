"""Test configuration: run everything on CPU with 8 virtual devices.

Mirrors SURVEY.md section 4's prescription: Pallas kernels run in interpret
mode on CPU; multi-device sharding tests use xla_force_host_platform_device_count.
Set SVT_TEST_TPU=1 to run the suite on the real TPU instead.

Note: this environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon, so the env var route is too late — use
jax.config.update, which works as long as no backend has been initialized.
"""

import os

if not os.environ.get("SVT_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
