"""Camera-convention and mesh-utility tests."""

import numpy as np


def test_opengl_transform_roundtrip():
    from morefusion_tpu.geometry import (
        from_opengl_transform,
        to_opengl_transform,
    )

    rng = np.random.RandomState(0)
    # a valid rigid transform
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.normal(size=3)

    gl = to_opengl_transform(T)
    # z axis flips, x axis preserved, translation preserved
    np.testing.assert_allclose(gl[:3, 3], T[:3, 3])
    np.testing.assert_allclose(gl[:3, 0], T[:3, 0])
    np.testing.assert_allclose(gl[:3, 2], -T[:3, 2])
    # involution: from(to(T)) == T
    np.testing.assert_allclose(from_opengl_transform(gl), T, atol=1e-12)
    np.testing.assert_allclose(
        to_opengl_transform(), from_opengl_transform()
    )


def test_bin_model_and_tile_meshes():
    from morefusion_tpu.extra.meshio import bin_model, box_mesh, tile_meshes

    v, f = bin_model((0.3, 0.2, 0.1), thickness=0.01)
    assert v.shape == (40, 3) and f.shape == (60, 3)
    # open top: max z comes from the tall x walls, bottom plate at -z
    assert np.isclose(v[:, 2].max(), 0.05)
    assert np.isclose(v[:, 2].min(), -0.05)
    assert f.min() >= 0 and f.max() < len(v)

    meshes = [box_mesh((0.1, 0.1, 0.1)) for _ in range(5)]
    tv, tf = tile_meshes(meshes)
    assert len(tv) == 5 * 8 and len(tf) == 5 * 12
    # cells don't overlap: pairwise center distances >= spacing-ish
    centers = tv.reshape(5, 8, 3).mean(axis=1)
    d = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
    assert (d[np.triu_indices(5, 1)] > 0.1).all()
