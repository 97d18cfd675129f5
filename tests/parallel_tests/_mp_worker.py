"""Worker process for the 2-process distributed test.

Launched by test_multiprocess.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set — exercising
``parallel.maybe_initialize``'s env-var path — on a scrubbed CPU
environment with 4 virtual devices per process.

Writes a JSON result file (argv[1]) from rank 0.
"""

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."),
)


def main():
    out_path = sys.argv[1]

    import jax

    from morefusion_tpu import parallel

    initialized = parallel.maybe_initialize()
    assert initialized, "maybe_initialize did not trigger from env vars"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    # host-object collectives round-trip (reference bcast_obj/gather_obj
    # roles, pose_estimation_evaluator.py:80-87)
    payload = {"out_dir": "/tmp/run", "seed": 7}
    got = parallel.broadcast_obj(payload if parallel.is_primary() else None)
    assert got == payload, got

    gathered = parallel.gather_obj(
        {"rank": jax.process_index(), "n": 10 + jax.process_index()}
    )
    if parallel.is_primary():
        assert gathered is not None and len(gathered) == 2
        assert sorted(g["rank"] for g in gathered) == [0, 1]
    else:
        assert gathered is None

    from _mp_common import run_scenario

    result = run_scenario()
    result["bcast_ok"] = True
    result["gather_ok"] = True
    if parallel.is_primary():
        with open(out_path, "w") as f:
            json.dump(result, f)
    print(f"worker {jax.process_index()} done", flush=True)


if __name__ == "__main__":
    main()
