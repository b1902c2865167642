"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; shardings are validated on
XLA's host-platform virtual devices (same compilation path as a real mesh).

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS to
the remote TPU plugin before conftest runs, so the platform must be switched
via jax.config (env vars are read too early to matter).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# XLA-CPU's default matmul runs at reduced precision; parity tests vs
# HF/torch fp32 need full fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
