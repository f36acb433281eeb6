import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4e).  PCRCG_TEST_TPU=1 keeps
# the real backend instead (targeted on-chip runs, e.g. the dequantization
# exactness tests — .claude/skills/verify/SKILL.md; NEVER run the full
# suite this way, and never concurrently with another chip client).
_ON_TPU = os.environ.get("PCRCG_TEST_TPU") == "1"
if not _ON_TPU:
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
# Even with the ISA cap, rare SEGVs remain *inside* LLVM codegen on long
# runs (hundreds of compiles in one process; crash site
# jax compiler.py backend_compile_and_load).  XLA:CPU splits each module
# for parallel codegen across threads by default — serialize it; the
# suite's programs are small, so compile-time impact is minor.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax

# The env var alone does not stick when a TPU plugin (axon) pre-set it.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from pcrcg_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# The biggest XLA:CPU compiles (full trainer/tester programs) segfault
# inside LLVM codegen when they happen late in a long run (hundreds of
# executables already JIT-loaded in the process; crash site
# backend_compile_and_load, observed twice at test_trainer's init_model
# after ~100 green tests; the same tests pass standalone; a later run
# crashed at test_model's deformable-grad compile instead — it is "any
# big compile after enough accumulated JIT state", not one program).
# Mitigations: xdist process isolation (pyproject addopts) splits the
# suite across 4 workers, and heavy-compile modules run FIRST so under
# loadscope they spread across workers while each process's JIT state is
# small.
_HEAVY_FIRST = [
    "test_trainer",
    "test_train",
    "test_accuracy_evidence",
    "test_indoor_tester",
    "test_modelnet_e2e",
    "test_parallel",
]


def pytest_collection_modifyitems(config, items):
    rank = {name: i for i, name in enumerate(_HEAVY_FIRST)}
    items.sort(key=lambda it: rank.get(it.module.__name__, len(_HEAVY_FIRST)))
