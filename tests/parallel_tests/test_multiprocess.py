"""Multi-process data parallelism: 2 processes x 4 virtual CPU devices.

VERDICT round-2 item 5: ``parallel/distributed.py`` (maybe_initialize,
broadcast_obj, gather_obj) had never executed with process_count > 1.
This test launches two real worker processes over a loopback coordinator
(``jax.distributed`` + gloo CPU collectives), asserts the host-object
collectives round-trip, and checks the 2-step dp-train-step result
matches this process's single-process 8-device run of the identical
scenario (reference role: ChainerMN pure_nccl data parallelism,
``train.py:228-233`` — same model whatever the process layout).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(process_id, num_processes, port):
    env = dict(os.environ)
    # scrub the axon TPU-relay hook exactly like the test harness does
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    )
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the pytest process (the single-process reference) runs with x64
    # enabled (tests/conftest.py:32); the workers must match or the
    # float64 promotion paths diverge at the ~1e-2 level
    env["JAX_ENABLE_X64"] = "True"
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = str(num_processes)
    env["JAX_PROCESS_ID"] = str(process_id)
    return env


@pytest.mark.heavy
def test_two_process_data_parallel(tmp_path):
    out_path = str(tmp_path / "rank0.json")
    port = _free_port()

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_mp_worker.py"), out_path],
            env=_worker_env(i, 2, port),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=2400)
            outs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))

    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker {p.args} failed (rc={p.returncode}):\n{out[-4000:]}"
        )
    assert os.path.exists(out_path), outs[0][-2000:]
    with open(out_path) as f:
        mp = json.load(f)
    assert mp["bcast_ok"] and mp["gather_ok"]

    # single-process 8-device reference of the identical scenario
    import jax

    assert jax.process_count() == 1 and jax.device_count() == 8
    sys.path.insert(0, HERE)
    try:
        from _mp_common import run_scenario
    finally:
        sys.path.remove(HERE)
    sp = run_scenario()

    np.testing.assert_allclose(mp["losses"], sp["losses"], rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        mp["param_sum"], sp["param_sum"], rtol=1e-7
    )
    # bitwise equality is achieved in practice on CPU (deterministic
    # reductions); record it as the strong assertion when it holds
    assert mp["param_hash"] == sp["param_hash"] or np.isclose(
        mp["param_sum"], sp["param_sum"], rtol=1e-7
    )
