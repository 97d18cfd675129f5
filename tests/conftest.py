"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices (the driver
separately dry-runs them via ``__graft_entry__.dryrun_multichip``); TPU
hardware runs are reserved for bench.py.
"""

import os

_TPU_RUN = os.environ.get("MFTPU_TPU_TESTS") == "1"

if not _TPU_RUN:
    # Must be set before jax is imported anywhere. Force CPU even if the
    # outer environment selects a TPU platform — unit tests are CPU-mesh
    # only. (MFTPU_TPU_TESTS=1 runs keep the real platform so the
    # tpu-marked Pallas parity tests exercise actual hardware.)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # persistent compile cache across runs (see _mftpu_test_env.py);
    # this fallback covers direct `pytest tests/...` invocations that
    # skip the re-exec plugin
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/mftpu_test_cache"
    )
    os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5"
    )

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not _TPU_RUN:
    # float64 for numerical gradient checks (production code is float32;
    # the ops take their working dtype from their inputs). TPU runs stay
    # float32 — x64 tracing is unsupported by the TPU Pallas lowering.
    jax.config.update("jax_enable_x64", True)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
