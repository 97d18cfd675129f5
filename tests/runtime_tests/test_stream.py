"""process_stream (software-pipelined serving) vs sequential process_frame."""

import jax
import numpy as np

from morefusion_tpu import runtime
from morefusion_tpu.datasets import ProceduralModels
from morefusion_tpu.models import tiny_singleview3d
from morefusion_tpu.simulation import PlaneTypeSceneGeneration


def _make_pipe(models):
    model = tiny_singleview3d(21, n_point=32, with_occupancy=True)
    rng = np.random.RandomState(0)
    params = model.init(
        jax.random.PRNGKey(0),
        class_id=np.ones(1, np.int32),
        rgb=rng.rand(1, 256, 256, 3).astype(np.float32),
        pcd=rng.rand(1, 256, 256, 3).astype(np.float32),
        pitch=np.ones(1, np.float32) * 0.01,
        grid_nontarget_empty=np.zeros((1, 32, 32, 32), np.float32),
    )
    return runtime.ScenePipeline(
        model, params, models, native_mapping=True, size_filter=False,
        n_votes=1,
    )


def test_stream_matches_sequential():
    models = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models, n_object=2, random_state=np.random.RandomState(7)
    )
    gen.generate()
    traj = gen.random_camera_trajectory(4, 3)
    frames = [
        gen.render_frame(T, shape=(120, 160), n_points_per_object=6000)
        for T in traj[:3]
    ]

    def stream_frames():
        for frame in frames:
            yield dict(
                rgb=frame["rgb"].astype(np.float32),
                depth=frame["depth"],
                K=frame["intrinsic_matrix"],
                T_cam2world=frame["T_cam2world"],
                instance_label=frame["instance_label"],
                instance_to_class={
                    int(i): int(frame["class_ids"][k])
                    for k, i in enumerate(frame["instance_ids"])
                },
            )

    pipe_a = _make_pipe(models)
    seq = []
    for f in stream_frames():
        seq.append(
            pipe_a.process_frame(
                f["rgb"], f["depth"], f["K"], f["T_cam2world"],
                instance_label=f["instance_label"],
                instance_to_class=f["instance_to_class"],
                refine=False,
            )
        )

    pipe_b = _make_pipe(models)
    streamed = list(pipe_b.process_stream(stream_frames(), refine=False))

    assert len(streamed) == len(seq) == 3
    for res_seq, res_str in zip(seq, streamed):
        assert set(res_seq.keys()) == set(res_str.keys())
        for ins_id in res_seq:
            np.testing.assert_allclose(
                res_seq[ins_id]["T_cad2cam"],
                res_str[ins_id]["T_cad2cam"],
                atol=1e-5,
            )
            assert (
                res_seq[ins_id]["class_id"] == res_str[ins_id]["class_id"]
            )
