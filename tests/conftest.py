"""Test harness configuration.

Tests run on the CPU backend with float64 enabled so the reference
tolerances (down to 1e-10) are meaningful, and with an 8-device virtual CPU
mesh so multi-chip sharding tests exercise real collectives without TPU
hardware. This mirrors how the reference suite runs grid-small cases on CPU.

Note: this environment's sitecustomize force-registers a TPU ('axon')
backend and sets jax_platforms='axon,cpu' at interpreter startup, so the
JAX_PLATFORMS env var alone is not enough — we override the config knob
directly before any backend is initialised.
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
