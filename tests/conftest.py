"""Test config: run everything on CPU with 8 virtual devices so sharding
paths (mesh, GSPMD, collectives) are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# reference-model parity tests need legacy keras before any tf import
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

# JAX's DEFAULT matmul precision runs bf16 passes (shape-dependent) even on
# the CPU backend; numeric-parity tests need true f32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")
