"""Test configuration: force CPU backend with 8 virtual devices so the full
multi-chip sharding path is exercised without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize registers a TPU PJRT plugin and calls
`jax.config.update("jax_platforms", "axon,cpu")` in every process, which
overrides the JAX_PLATFORMS env var — so we must force CPU via config.update
AFTER importing jax, before any backend is initialized.

Run tests on the real TPU instead with: EETQ_TEST_TPU=1 python -m pytest
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_timeout_seconds" not in flags:
    # XLA CPU kills the process (rendezvous.cc termination timeout, 40 s
    # default) when the 8 virtual devices' threads don't all reach a
    # psum in time — which big sharded tests on ONE core can trip.
    flags = (
        flags
        + " --xla_cpu_collective_timeout_seconds=1200"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

if not os.environ.get("EETQ_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules. Full-suite runs
    accumulate hundreds of XLA CPU compilations in one process and
    eventually SEGFAULT inside `backend_compile_and_load` at ~82% (r4:
    twice at test_spec's two-model while_loop; r5: at test_sharding's
    shard_map forward after the spec compile moved to a subprocess — the
    crash follows whatever heavy compile lands late in the process, not a
    specific program). Clearing per module bounds the live compiled-code
    footprint; the recompiles it forces are tiny-test-sized."""
    yield
    jax.clear_caches()
    gc.collect()
