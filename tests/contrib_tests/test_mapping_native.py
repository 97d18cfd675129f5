"""Parity tests: C++ mapping backend vs. the NumPy reference implementation."""

import numpy as np
import pytest

from morefusion_tpu.contrib import MultiInstanceOccupancyMapping
from morefusion_tpu.contrib.mapping_native import (
    NativeMultiInstanceMapping,
    available,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native mapping backend not built"
)


def _plane_cloud(z=0.5, H=60, W=80, step=0.004):
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    pcd = np.dstack(
        [(jj - W / 2) * step, (ii - H / 2) * step, np.full_like(jj, z, float)]
    ).astype(np.float32)
    return pcd


def test_native_matches_python_occupied_voxels():
    pcd = _plane_cloud()
    mask = np.ones(pcd.shape[:2], bool)

    py = MultiInstanceOccupancyMapping()
    py.initialize(0, pitch=0.01)
    py.integrate(0, mask, pcd, carve=False)

    nat = NativeMultiInstanceMapping()
    nat.initialize(0, pitch=0.01)
    nat.integrate(0, mask, pcd, carve=False)

    occ_py, _ = py.get_target_pcds(0)
    occ_nat, _ = nat.get_target_pcds(0)
    # same voxel set (centers at (i+0.5)*pitch -> floor recovers indices)
    a = set(map(tuple, np.floor(occ_py / 0.01).astype(int)))
    b = set(map(tuple, np.floor(occ_nat / 0.01).astype(int)))
    assert a == b


def test_native_grids_match_python_contract():
    pcd = _plane_cloud()
    mask = np.ones(pcd.shape[:2], bool)

    for cls in (MultiInstanceOccupancyMapping, NativeMultiInstanceMapping):
        m = cls()
        m.initialize(0, pitch=0.01)
        m.integrate(0, mask, pcd)
        g_t, g_n, g_e = m.get_target_grids(
            0, dimensions=(16, 16, 16), pitch=0.01,
            origin=(-0.08, -0.08, 0.42),
        )
        assert g_t.max() > 0.5, cls.__name__
        assert g_e.max() > 0.5, cls.__name__
        assert g_n.sum() == 0, cls.__name__
        occ_z = np.argwhere(g_t > 0.5)[:, 2]
        assert np.abs(occ_z - 8).max() <= 1, cls.__name__


def test_native_render_roundtrip():
    """Integrate a plane seen from the origin, re-render it: label + depth."""
    pcd = _plane_cloud(z=0.5)
    H, W = pcd.shape[:2]
    mask = np.ones((H, W), bool)

    m = NativeMultiInstanceMapping()
    m.initialize(3, pitch=0.01)
    m.integrate(3, mask, pcd)

    K = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1]])
    label, depth = m.render(K, np.eye(4), (H, W))
    hit = label == 3
    assert hit.mean() > 0.5
    assert np.nanmedian(depth[hit]) == pytest.approx(0.5, abs=0.05)


def test_native_multi_instance_and_reset():
    m = NativeMultiInstanceMapping()
    m.initialize(0, pitch=0.01)
    m.initialize(1, pitch=0.02)
    with pytest.raises(ValueError):
        m.initialize(0, pitch=0.01)
    assert sorted(m.instance_ids) == [0, 1]
    m.update(1, np.array([[0.1, 0.1, 0.1]], np.float32))
    assert m.num_voxels(1) == 1
    prob = m.query_probability(1, np.array([[0.1, 0.1, 0.1]]))
    assert prob[0] > 0.9
    prob_unknown = m.query_probability(1, np.array([[5.0, 5.0, 5.0]]))
    assert prob_unknown[0] == -1.0
    m.reset()
    assert m.instance_ids == []
