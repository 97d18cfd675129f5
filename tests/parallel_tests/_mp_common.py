"""Shared deterministic train-step scenario for the multi-process test.

Builds the identical tiny model + batch + bank in every process and runs
two dp train steps over whatever global mesh is active; the results must
agree between one process x 8 devices and 2 processes x 4 devices
(reference role: ChainerMN data parallelism gives the same model
regardless of process layout, SURVEY.md §2.2).
"""

import numpy as np

H = W = 32
N_CLASS = 3  # small class count keeps the CPU compile fast
B = 8


def make_batch():
    rng = np.random.RandomState(1234)
    from morefusion_tpu.datasets import ProceduralModels

    models = ProceduralModels()
    batch = dict(
        class_id=rng.randint(1, N_CLASS + 1, (B,)).astype(np.int32),
        rgb=rng.randint(0, 255, (B, H, W, 3)).astype(np.float32),
        pcd=rng.uniform(0.2, 0.6, (B, H, W, 3)).astype(np.float32),
        quaternion_true=np.tile(np.array([1, 0, 0, 0], np.float32), (B, 1)),
        translation_true=rng.uniform(0.3, 0.5, (B, 3)).astype(np.float32),
    )
    batch["pitch"] = np.array(
        [models.get_voxel_pitch(32, c) for c in batch["class_id"]],
        np.float32,
    )
    batch["origin"] = rng.uniform(-0.2, 0.0, (B, 3)).astype(np.float32)
    batch["grid_target"] = rng.uniform(size=(B, 32, 32, 32)).astype(
        np.float32
    )
    batch["grid_nontarget_empty"] = rng.uniform(size=(B, 32, 32, 32)).astype(
        np.float32
    )
    return batch


def run_scenario():
    """Two dp train steps on the global mesh; returns results on rank 0.

    Returns dict(losses=[2 floats], param_sum=float, param_hash=str) on
    every process (values are identical across processes because the
    train state is replicated).
    """
    import hashlib

    import jax

    from morefusion_tpu import parallel, training
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.models import tiny_singleview3d

    model = tiny_singleview3d(N_CLASS, n_point=16, with_occupancy=True)
    bank = training.CadPointBank.build(
        ProceduralModels(), N_CLASS, n_points=32,
        with_solid=True, max_solid_points=128,
    )
    batch = make_batch()
    state = training.create_train_state(
        model, batch, jax.random.PRNGKey(0), with_occupancy=True
    )
    mesh = parallel.data_mesh()
    step = training.make_dp_train_step(
        model, bank, mesh, with_occupancy=True
    )
    state = parallel.replicate(state, mesh)
    sb = parallel.shard_batch(batch, mesh)

    # Pre-compile, then rendezvous: on a contended single-core host two
    # concurrent XLA compiles can skew by minutes, but Gloo's context
    # rendezvous at the first collective *execution* has a hard 30 s
    # window — so compile first, then enter the first execution
    # together (parallel.barrier is a pure coordination-service RPC).
    cstep = step.lower(
        state, sb, np.bool_(False), jax.random.PRNGKey(42)
    ).compile()
    parallel.barrier("mp_step_compiled")

    losses = []
    for _ in range(2):
        state, metrics = cstep(
            state, sb, np.bool_(False), jax.random.PRNGKey(42)
        )
        losses.append(float(np.asarray(jax.device_get(metrics["loss"]))))

    leaves = jax.tree.leaves(jax.device_get(state.params))
    param_sum = float(sum(np.abs(np.asarray(x)).sum() for x in leaves))
    digest = hashlib.sha256()
    for x in leaves:
        digest.update(np.ascontiguousarray(np.asarray(x)).tobytes())
    return dict(
        losses=losses, param_sum=param_sum, param_hash=digest.hexdigest()
    )
