"""Model forward/loss smoke + shape tests (small resolutions for CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import morefusion_tpu
from morefusion_tpu import models as M


H = W = 64  # small crops for CPU tests; production is 256
N_CLASS = 4


def _fake_inputs(rng, B=2):
    rgb = rng.randint(0, 255, (B, H, W, 3)).astype(np.float32)
    pcd = rng.uniform(-0.2, 0.8, (B, H, W, 3)).astype(np.float32)
    pcd[:, : H // 4] = np.nan  # partial mask
    class_id = rng.randint(1, N_CLASS + 1, (B,)).astype(np.int32)
    pitch = np.full((B,), 0.01, np.float32)
    return rgb, pcd, class_id, pitch


def test_sample_mask_indices_without_replacement(rng):
    mask = np.zeros((1, 8, 8), bool)
    mask[0, :4] = True  # 32 valid pixels
    idx = np.asarray(
        M.sample_mask_indices(mask, jax.random.PRNGKey(0), 16)
    )[0]
    assert len(np.unique(idx)) == 16  # no replacement when enough pixels
    assert (idx < 32).all()


def test_sample_mask_indices_fill_when_short(rng):
    mask = np.zeros((1, 8, 8), bool)
    mask[0, 0, :5] = True  # only 5 valid
    idx = np.asarray(
        M.sample_mask_indices(mask, jax.random.PRNGKey(0), 16)
    )[0]
    assert set(np.unique(idx)) <= set(range(5))
    assert len(np.unique(idx)) == 5  # all valid pixels used


def test_masked_median():
    vals = np.array([[[1.0, 10], [2, 20], [3, 30], [99, 99]]])
    mask = np.array([[True, True, True, False]])
    med = np.asarray(M.masked_median(vals, mask))
    np.testing.assert_allclose(med, [[2.0, 20.0]])


def test_resnet_output_shape(rng):
    model = M.DilatedResNet18()
    x = rng.randint(0, 255, (1, H, W, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, H // 8, W // 8, 512)


def test_pspnet_output_shape(rng):
    model = M.PSPNetExtractor()
    x = rng.uniform(size=(1, H // 8, W // 8, 512)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, H, W, 32)
    # log_softmax output: logsumexp over channels == 0
    lse = jax.scipy.special.logsumexp(y, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)


@pytest.mark.parametrize("with_occupancy", [False, True])
def test_singleview3d_forward(rng, with_occupancy):
    B = 2
    rgb, pcd, class_id, pitch = _fake_inputs(rng, B)
    grid = (
        rng.uniform(size=(B, 32, 32, 32)).astype(np.float32)
        if with_occupancy
        else None
    )
    model = M.SingleView3D(
        n_fg_class=N_CLASS, n_point=64, with_occupancy=with_occupancy
    )
    kwargs = dict(
        class_id=class_id, rgb=rgb, pcd=pcd, pitch=pitch,
        grid_nontarget_empty=grid, rng=jax.random.PRNGKey(0),
    )
    params = model.init(jax.random.PRNGKey(0), **kwargs)
    quat, trans, conf = model.apply(params, **kwargs)
    assert quat.shape == (B, 64, 4)
    assert trans.shape == (B, 64, 3)
    assert conf.shape == (B, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(quat), axis=-1), 1.0, atol=1e-5
    )
    assert (np.asarray(conf) >= 0).all() and (np.asarray(conf) <= 1).all()
    assert not np.isnan(np.asarray(trans)).any()


def test_posenet_forward(rng):
    B = 2
    rgb, pcd, class_id, _ = _fake_inputs(rng, B)
    model = M.PoseNet(n_fg_class=N_CLASS, n_point=64)
    kwargs = dict(
        class_id=class_id, rgb=rgb, pcd=pcd, rng=jax.random.PRNGKey(0)
    )
    params = model.init(jax.random.PRNGKey(0), **kwargs)
    quat, trans, conf = model.apply(params, **kwargs)
    assert quat.shape == (B, 64, 4)
    assert trans.shape == (B, 64, 3)
    assert conf.shape == (B, 64)


def test_pose_loss_and_eval(rng):
    B, P, N = 2, 16, 50
    q = rng.normal(size=(B, P, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.uniform(-0.1, 0.1, (B, P, 3)).astype(np.float32)
    conf = rng.uniform(0.1, 1, (B, P)).astype(np.float32)
    q_true = rng.normal(size=(B, 4)).astype(np.float32)
    q_true /= np.linalg.norm(q_true, axis=-1, keepdims=True)
    t_true = rng.uniform(-0.1, 0.1, (B, 3)).astype(np.float32)
    cad = rng.uniform(-0.05, 0.05, (B, N, 3)).astype(np.float32)
    sym = np.array([False, True])

    loss = M.losses.pose_loss(
        quaternion_pred=q, translation_pred=t, confidence_pred=conf,
        quaternion_true=q_true, translation_true=t_true,
        cad_points=cad, symmetric=sym,
    )
    assert np.isfinite(float(loss))

    # perfect prediction -> loss is just the confidence regularizer
    qp = np.tile(q_true[:, None], (1, P, 1))
    tp = np.tile(t_true[:, None], (1, P, 1))
    conf1 = np.ones((B, P), np.float32)
    loss0 = float(
        M.losses.pose_loss(
            quaternion_pred=qp, translation_pred=tp, confidence_pred=conf1,
            quaternion_true=q_true, translation_true=t_true,
            cad_points=cad, symmetric=sym,
        )
    )
    assert loss0 == pytest.approx(0.0, abs=1e-4)

    ev = M.losses.evaluate_add(
        quaternion_pred=qp, translation_pred=tp, confidence_pred=conf1,
        quaternion_true=q_true, translation_true=t_true,
        cad_points=cad, symmetric=sym,
    )
    np.testing.assert_allclose(np.asarray(ev["add"]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev["add_or_add_s"]), 0.0, atol=1e-5)


def test_occupancy_loss_runs(rng):
    B, P, M_ = 2, 8, 100
    q = rng.normal(size=(B, P, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.uniform(-0.05, 0.05, (B, P, 3)).astype(np.float32)
    conf = rng.uniform(0.1, 1, (B, P)).astype(np.float32)
    solid = rng.uniform(-0.03, 0.03, (B, M_, 3)).astype(np.float32)
    sdf = rng.uniform(0, 0.02, (B, M_)).astype(np.float32)
    mask = np.ones((B, M_), bool)
    mask[:, 80:] = False
    pitch = np.full((B,), 0.01, np.float32)
    origin = np.full((B, 3), -0.16, np.float32)
    g_tgt = rng.uniform(size=(B, 32, 32, 32)).astype(np.float32)
    g_nte = rng.uniform(size=(B, 32, 32, 32)).astype(np.float32)

    loss = M.losses.occupancy_loss(
        quaternion_pred=q, translation_pred=t, confidence_pred=conf,
        solid_points=solid, solid_sdf=sdf, solid_mask=mask,
        pitch=pitch, origin=origin,
        grid_target=g_tgt, grid_nontarget_empty=g_nte,
    )
    assert np.isfinite(float(loss))
