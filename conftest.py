"""Root conftest: fallback re-exec with a scrubbed environment.

The container boots every python process through an axon sitecustomize hook
(PYTHONPATH=/root/.axon_site) that registers a remote-compile TPU relay —
it intercepts XLA compilation, making CPU unit-test compiles take minutes.
Unit tests are CPU-only by design (the driver exercises the real TPU via
bench.py / __graft_entry__.py), so we re-exec pytest once with the relay
disabled and a virtual 8-device CPU platform.

Normally the re-exec happens in ``_mftpu_test_env`` (loaded via ``-p`` in
pytest.ini, before pytest's fd capture starts, so output is preserved).
This fallback covers invocations where that plugin wasn't importable; by
conftest-import time pytest has already redirected fd 1/2, so the child's
output is swallowed — but the exit code is still correct.
"""

import os
import sys

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("MFTPU_TESTS_REEXEC") != "1"
    and os.environ.get("MFTPU_TPU_TESTS") != "1"
):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _mftpu_test_env import scrubbed_env

    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        scrubbed_env(),
    )
