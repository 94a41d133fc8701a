"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

Numerics-parity tests need float64 (the 1e-8 gate, SURVEY.md section 7
"hard parts" #2); sharding tests need multiple devices.  Both are provided
by the CPU backend -- TPU-specific kernels are exercised separately when a
TPU is attached (see tests/test_tpu_smoke.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; the config update is honored.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: TDVP/scan programs compile once across
# test sessions
from timecrystal_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Free each module's compiled XLA executables before the next starts.

    A monolithic ``pytest tests/`` run accumulates every module's compiled
    programs in-process; at round-5 suite size that reproducibly crashed
    the CPU client (SIGSEGV/SIGABRT inside a later pjit compile --
    always the same compile once the suite grew past ~300 programs;
    per-module subprocess runs like tests/run_tests.py never hit it).
    Dropping the in-memory executable caches at module boundaries keeps
    the live-program count bounded; the persistent compilation cache
    makes the occasional re-compile a cheap deserialization.
    """
    yield
    import jax

    jax.clear_caches()
