import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4e).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# This VM masks CPUID features (boot warnings: "+prefer-no-gather is not a
# recognized feature ... SIGILL"); XLA:CPU's LLVM JIT then segfaults
# *during compile* on long runs (observed in test_trainer's init_model
# compile).  Capping codegen at AVX2 avoids the mis-detected AVX512 paths.
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax

# The env var alone does not stick when a TPU plugin (axon) pre-set it.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from pcrcg_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
