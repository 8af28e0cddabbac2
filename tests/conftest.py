"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver benches on real TPU separately)."""

import os

# NOTE: the axon TPU plugin in this image ignores JAX_PLATFORMS; only
# JAX_PLATFORM_NAME reliably forces the CPU backend. Set both.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# JAX >= 0.9 lowers fp32 matmuls to bf16 by default (TPU-friendly); tests
# verify math against fp64/numpy oracles, so force exact fp32 here.
import jax

# sitecustomize (axon) imports jax at interpreter startup with
# JAX_PLATFORMS=axon pinned — the env vars above are too late. Force the
# backend choice at the config level, which wins over the startup pin.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# CPU op-compiles in this image are slow (~seconds each); persist them.
from aot_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()
