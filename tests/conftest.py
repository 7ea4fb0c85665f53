"""Test harness config: CPU backend with a virtual 8-device mesh (for
sharding tests without a pod) and x64 enabled so the reference crate's f64
tolerances (e.g. |f - 0| < 1e-6 on the gamma=1e9 quadratic) are reproducible.

Note: this environment's sitecustomize force-registers the axon TPU backend
regardless of JAX_PLATFORMS in the env, so the platform override must happen
through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
