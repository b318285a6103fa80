"""Test environment: force the CPU backend with 8 fake devices so
distributed tests exercise real mesh/collective code paths without TPU
hardware (SURVEY.md §4).

NOTE: the axon TPU sitecustomize imports jax at interpreter startup, so env
vars are too late here — `jax.config.update` is the reliable override (the
backend itself is created lazily, so XLA_FLAGS still applies)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu" and len(jax.devices()) >= 8, (
    "test env must provide 8 fake CPU devices")
