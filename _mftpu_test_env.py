"""Early pytest plugin: re-exec with the axon TPU-relay hook disabled.

Loaded via ``-p _mftpu_test_env`` in pytest.ini *before* pytest's fd-level
capture starts, so the re-exec'ed child inherits the real stdout/stderr.
See conftest.py (fallback with the same logic) for why the scrub is needed:
the container's sitecustomize routes all XLA compilation through a remote
TPU relay, which makes CPU unit-test compiles take minutes each.
"""

import os
import sys

_MARK = "MFTPU_TESTS_REEXEC"


def scrubbed_env():
    env = dict(os.environ)
    env[_MARK] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    parts = env.get("PYTHONPATH", "").split(os.pathsep)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in parts if p and ".axon_site" not in p
    )
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # persistent XLA compilation cache: the suite's cost is dominated by
    # CPU test compiles (shared 8-device programs); caching them across
    # runs roughly halves compile-heavy files (measured 42.5s -> 21.7s
    # on tests/functions_tests -k sorted). VERDICT-3 item 8.
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/mftpu_test_cache"
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    return env


if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get(_MARK) != "1"
    # TPU-hardware test runs (tests/ops_tests -m tpu) must keep the relay
    # env — the whole point is to exercise the real TPU kernels.
    and os.environ.get("MFTPU_TPU_TESTS") != "1"
):
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        scrubbed_env(),
    )
