"""Test configuration.

Correctness tests run in float64 on a CPU backend with a virtual 8-device
mesh (TPU has no native f64); the bench and the graft entry run on the real
TPU chip in f32/bf16.

This environment force-registers a remote-TPU ("axon") PJRT plugin in every
Python process and pins JAX_PLATFORMS=axon; we override the platform to pure
CPU *before* any backend is initialized so unit tests never touch the TPU
tunnel and compiles stay local.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()} ({jax.devices()[0].platform})"
