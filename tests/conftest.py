"""Test environment: force the CPU backend with 8 fake devices so
distributed tests exercise real mesh/collective code paths without TPU
hardware (SURVEY.md §4). Must run before any jax import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU plugin hook
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
