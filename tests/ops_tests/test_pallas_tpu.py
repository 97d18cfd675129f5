"""TPU-only parity tests for the Pallas kernels.

These run on real TPU hardware (skipped on the CPU test mesh):
  MFTPU_TPU_TESTS=1 python -m pytest tests/ops_tests -m tpu
"""

import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("MFTPU_TPU_TESTS") != "1",
        reason="TPU hardware tests disabled (set MFTPU_TPU_TESTS=1)",
    ),
]


def test_min_dist_pallas_parity():
    import jax.numpy as jnp

    from morefusion_tpu.ops.min_dist_pallas import min_dist_voxels_pallas

    rng = np.random.RandomState(0)
    P = 2048
    ip = rng.uniform(0, 32, (P, 3)).astype(np.float32)
    valid = np.ones(P, bool)
    valid[1500:] = False

    d2, arg = min_dist_voxels_pallas(
        jnp.asarray(ip), jnp.asarray(valid), (32, 32, 32)
    )
    centers = (
        np.stack(
            np.meshgrid(*(np.arange(32),) * 3, indexing="ij"), -1
        )
        .reshape(-1, 3)
        .astype(np.float64)
    )
    dd = ((centers[:, None, :] - ip[None, :1500, :]) ** 2).sum(-1)
    ref = dd.min(1)
    # winner distances are exact up to the composite-key tie quantum
    assert np.abs(np.asarray(d2) - ref).max() < 0.05
    assert (np.asarray(arg) < 1500).all()  # masked points never win


def test_nn_pallas_parity():
    import jax.numpy as jnp

    from morefusion_tpu.ops.knn_pallas import nn_pallas

    rng = np.random.RandomState(1)
    ref = rng.uniform(size=(300, 3)).astype(np.float32)
    query = rng.uniform(size=(1000, 3)).astype(np.float32)
    idx = np.asarray(nn_pallas(jnp.asarray(ref), jnp.asarray(query)))
    d = ((query[:, None] - ref[None]) ** 2).sum(-1)
    expect = d.argmin(1)
    agree = (idx == expect).mean()
    assert agree > 0.99
