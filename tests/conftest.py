"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (SURVEY.md §4).

The container's axon sitecustomize registers a TPU-tunnel backend and forces
jax_platforms at interpreter start, so an env var alone is not enough — we
override the jax config directly before any test imports run computations.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
