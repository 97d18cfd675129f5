"""Integration tests: data-parallel train/eval steps on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from morefusion_tpu import parallel, training
from morefusion_tpu.datasets import ProceduralModels
from morefusion_tpu.models import tiny_singleview3d


H = W = 32
N_CLASS = 21
B = 8  # one per virtual device


def _fake_batch(rng, with_occupancy=False):
    models = ProceduralModels()
    batch = dict(
        class_id=rng.randint(1, N_CLASS + 1, (B,)).astype(np.int32),
        rgb=rng.randint(0, 255, (B, H, W, 3)).astype(np.float32),
        pcd=rng.uniform(0.2, 0.6, (B, H, W, 3)).astype(np.float32),
        quaternion_true=np.tile(
            np.array([1, 0, 0, 0], np.float32), (B, 1)
        ),
        translation_true=rng.uniform(0.3, 0.5, (B, 3)).astype(np.float32),
        use_symmetric=np.bool_(False),
    )
    batch["pitch"] = np.array(
        [models.get_voxel_pitch(32, c) for c in batch["class_id"]],
        np.float32,
    )
    if with_occupancy:
        batch["origin"] = rng.uniform(-0.2, 0.0, (B, 3)).astype(np.float32)
        batch["grid_target"] = rng.uniform(size=(B, 32, 32, 32)).astype(
            np.float32
        )
        batch["grid_nontarget_empty"] = rng.uniform(
            size=(B, 32, 32, 32)
        ).astype(np.float32)
    return batch


@pytest.mark.parametrize("with_occupancy", [False, True])
def test_train_step_data_parallel(rng, with_occupancy):
    assert jax.device_count() == 8

    models = ProceduralModels()
    model = tiny_singleview3d(
        N_CLASS, n_point=32, with_occupancy=with_occupancy
    )
    bank = training.CadPointBank.build(
        models, N_CLASS, n_points=64,
        with_solid=with_occupancy, max_solid_points=256,
    )
    batch = _fake_batch(rng, with_occupancy)

    state = training.create_train_state(
        model, batch, jax.random.PRNGKey(0), with_occupancy=with_occupancy
    )
    mesh = parallel.data_mesh()
    step = training.make_dp_train_step(
        model, bank, mesh, with_occupancy=with_occupancy
    )
    state = parallel.replicate(state, mesh)
    use_symmetric = batch.pop("use_symmetric")
    sb = parallel.shard_batch(batch, mesh)

    losses = []
    for i in range(2):
        state, metrics = step(state, sb, use_symmetric, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # parameters actually update
    assert int(state.step) == 2


def test_eval_step_and_evaluator(rng):
    models = ProceduralModels()
    model = tiny_singleview3d(N_CLASS, n_point=32)
    bank = training.CadPointBank.build(models, N_CLASS, n_points=64)
    batch = _fake_batch(rng)

    state = training.create_train_state(model, batch, jax.random.PRNGKey(0))
    eval_step = jax.jit(training.make_eval_step(model, bank))
    out = eval_step(
        state.params, {k: v for k, v in batch.items() if k != "use_symmetric"}
    )

    ev = training.Evaluator()
    ev.add_batch(out)
    summary = ev.summarize()
    assert "main/add/auc" in summary
    assert "main/add_or_add_s/auc" in summary
    assert 0.0 <= summary["main/add/auc"] <= 1.0


def test_summarize_records_perfect():
    class_ids = np.array([1, 1, 2, 2])
    adds = {"add": np.zeros(4)}
    s = training.summarize_records(class_ids, adds)
    assert s["main/add/auc"] == pytest.approx(1.0)
    assert s["main/add/<2cm"] == 1.0
    assert s["main/add/auc/0001"] == pytest.approx(1.0)


def test_checkpoint_roundtrip(tmp_path, rng):
    models = ProceduralModels()
    model = tiny_singleview3d(3, n_point=16)
    bank = training.CadPointBank.build(models, 3, n_points=32)
    batch = _fake_batch(rng)
    batch["class_id"] = np.clip(batch["class_id"], 1, 3)

    state = training.create_train_state(model, batch, jax.random.PRNGKey(0))
    mgr = training.CheckpointManager(str(tmp_path))
    mgr.save_latest(state, step=0)
    restored = mgr.restore_latest(state)
    assert restored is not None
    chex_leaf = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(
        np.asarray(chex_leaf),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )

    improved = mgr.save_best(state.params, "main/add/auc", 0.5)
    assert improved
    assert not mgr.save_best(state.params, "main/add/auc", 0.4)
    assert mgr.save_best(state.params, "main/add/auc", 0.6)


def test_log_report(tmp_path):
    lr = training.LogReport(str(tmp_path))
    lr.report({"main/loss": 1.0}, step=1, epoch=0.1)
    lr.report({"main/loss": 0.5}, step=2, epoch=0.2)
    import json

    with open(tmp_path / "log.json") as f:
        rows = json.load(f)
    assert len(rows) == 2
    assert rows[1]["main/loss"] == 0.5

    training.write_args(str(tmp_path), {"lr": 1e-4})
    args = training.load_args(str(tmp_path))
    assert args["lr"] == 1e-4
    assert "hostname" in args and "timestamp" in args


def test_batch_loader_multiprocess_matches_serial():
    """num_workers>0 must be bit-identical to the serial path: same epoch
    order (imap preserves it) and same per-example content."""
    from morefusion_tpu.training.data import BatchLoader

    class _DS:
        def __len__(self):
            return 13

        def __getitem__(self, i):
            r = np.random.RandomState(1000 + i)  # index-derived RNG
            return {
                "x": r.rand(4).astype(np.float32),
                "idx": np.int32(i),
            }

    kw = dict(batch_size=4, shuffle=True, seed=7, drop_last=True)
    serial = list(BatchLoader(_DS(), **kw))
    multi = list(BatchLoader(_DS(), num_workers=2, **kw))
    assert len(serial) == len(multi) == 3
    for a, b in zip(serial, multi):
        np.testing.assert_array_equal(a["idx"], b["idx"])
        np.testing.assert_array_equal(a["x"], b["x"])


def test_evaluator_records_roundtrip():
    """records() must serialize per-crop values losslessly and in order."""
    ev = training.Evaluator()
    ev.add_batch(
        {
            "class_id": np.array([1, 2]),
            "add": np.array([0.01, 0.02]),
            "add_s": np.array([0.005, 0.01]),
        }
    )
    ev.add_batch(
        {
            "class_id": np.array([3]),
            "add": np.array([0.03]),
            "add_s": np.array([0.015]),
        }
    )
    recs = ev.records()
    assert recs["class_id"] == [1, 2, 3]
    assert recs["add"] == pytest.approx([0.01, 0.02, 0.03])
    # json-serializable (plain python scalars)
    import json

    json.dumps(recs)
    # summarizing the records reproduces summarize()
    s_direct = ev.summarize()
    s_rec = training.summarize_records(
        np.asarray(recs["class_id"]),
        {k: np.asarray(v) for k, v in recs.items() if k != "class_id"},
    )
    for k, v in s_direct.items():
        assert s_rec[k] == pytest.approx(v)


def test_ablation_report_bootstrap_paired():
    """Paired bootstrap: identical records across variants -> zero delta CI."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "ablation_report",
        os.path.join(
            os.path.dirname(__file__), "..", "..", "examples",
            "ablation_report.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(0)
    n = 64
    rec = {
        "class_id": rng.randint(1, 4, n).tolist(),
        "add": np.abs(rng.randn(n) * 0.02).tolist(),
    }
    rec["add_s"] = (np.asarray(rec["add"]) * 0.5).tolist()
    rec["add_or_add_s"] = rec["add"]
    boot = mod._bootstrap({"a": rec, "b": dict(rec)}, n_boot=50)
    for _, key in mod._METRICS:
        d = boot["b"][key] - boot["a"][key]
        assert np.all(d == 0.0)  # paired resampling kills shared noise

    # misaligned class ids must be rejected, not silently mispaired
    bad = dict(rec)
    bad["class_id"] = list(reversed(rec["class_id"]))
    with pytest.raises(ValueError):
        mod._bootstrap({"a": rec, "b": bad}, n_boot=2)


def test_params_npz_roundtrip(tmp_path):
    """bf16 npz archive: structure-exact, bf16-accurate, int-exact."""
    params = {
        "dense": {
            "kernel": np.linspace(-2, 2, 12, dtype=np.float32).reshape(3, 4),
            "bias": np.zeros(4, np.float32),
        },
        "steps": np.arange(5, dtype=np.int32),
    }
    path = str(tmp_path / "p.npz")
    training.export_params_npz(params, path)
    back = training.import_params_npz(params, path)
    assert back["dense"]["kernel"].dtype == np.float32
    # bf16 has ~3 decimal digits; values here are exactly representable
    # to 2^-7 relative
    np.testing.assert_allclose(
        back["dense"]["kernel"], params["dense"]["kernel"], rtol=1e-2
    )
    np.testing.assert_array_equal(back["steps"], params["steps"])

    # restore_best falls back to the npz when the orbax dir is absent
    mgr = training.CheckpointManager(str(tmp_path))
    training.export_params_npz(
        params, str(tmp_path / "snapshot_model_best_validation_main_auc.npz")
    )
    got = mgr.restore_best(params, "validation/main/auc")
    assert got is not None
    np.testing.assert_allclose(
        got["dense"]["kernel"], params["dense"]["kernel"], rtol=1e-2
    )

    # a template leaf missing from the archive must raise, not zero-fill
    bad = dict(params)
    bad["extra"] = np.ones(2, np.float32)
    with pytest.raises(KeyError):
        training.import_params_npz(bad, path)


def test_import_backbone_npz_grafts_subtree_only(tmp_path):
    """pretrain_backbone.py contract: the archived resnet_extractor
    subtree replaces the template's; every other leaf is untouched."""
    pre = {
        "resnet_extractor": {
            "conv": {"kernel": np.full((2, 3), 7.0, np.float32)}
        }
    }
    path = str(tmp_path / "backbone.npz")
    training.export_params_npz(pre, path)

    variables = {
        "params": {
            "resnet_extractor": {
                "conv": {"kernel": np.zeros((2, 3), np.float32)}
            },
            "heads": {"bias": np.ones(4, np.float32)},
        }
    }
    out = training.import_backbone_npz(variables, path)
    np.testing.assert_allclose(
        out["params"]["resnet_extractor"]["conv"]["kernel"], 7.0, rtol=1e-2
    )
    np.testing.assert_array_equal(
        out["params"]["heads"]["bias"], variables["params"]["heads"]["bias"]
    )
    # shape mismatch (different backbone width) must raise, not truncate
    wrong = {
        "params": {
            "resnet_extractor": {
                "conv": {"kernel": np.zeros((2, 5), np.float32)}
            },
            "heads": {"bias": np.ones(4, np.float32)},
        }
    }
    with pytest.raises(ValueError):
        training.import_backbone_npz(wrong, path)
