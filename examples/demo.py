#!/usr/bin/env python
"""End-to-end demo: synthetic scene -> full pipeline -> visualization PNG.

Equivalent of the reference's interactive demo
(``examples/ycb_video/singleview_3d/demo.py``) rendered offscreen: the
output image tiles [input rgb | GT segmentation | predicted-pose overlay].
Works with an untrained model (random poses) or a --log-dir checkpoint.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="/tmp/mftpu_demo.png")
    parser.add_argument("--log-dir", default=None, help="trained checkpoint")
    parser.add_argument("--seed", type=int, default=3)
    parser.add_argument("--n-objects", type=int, default=3)
    parser.add_argument("--image-shape", type=int, nargs=2, default=(240, 320))
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--refine", action="store_true", help="run ICC")
    args = parser.parse_args()

    import jax
    import numpy as np

    from morefusion_tpu import models, runtime, training
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.extra import viz
    from morefusion_tpu.simulation import PlaneTypeSceneGeneration

    models_bank = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models_bank,
        n_object=args.n_objects,
        random_state=np.random.RandomState(args.seed),
    )
    gen.generate()
    T_cam = gen.random_camera_trajectory(4, 3, distance=(0.45, 0.6))[0]
    frame = gen.render_frame(T_cam, shape=tuple(args.image_shape))

    make = models.tiny_singleview3d if args.tiny else (
        lambda n, **kw: models.SingleView3D(n_fg_class=n, **kw)
    )
    model = make(21, with_occupancy=True)
    rng = np.random.RandomState(0)
    init_kwargs = dict(
        class_id=np.ones(1, np.int32),
        rgb=rng.rand(1, 256, 256, 3).astype(np.float32),
        pcd=rng.rand(1, 256, 256, 3).astype(np.float32),
        pitch=np.ones(1, np.float32) * 0.01,
        grid_nontarget_empty=np.zeros((1, 32, 32, 32), np.float32),
    )
    params = model.init(jax.random.PRNGKey(0), **init_kwargs)
    if args.log_dir:
        mgr = training.CheckpointManager(args.log_dir)
        best = mgr.restore_best(params, "validation/main/auc")
        if best is not None:
            params = best

    pipe = runtime.ScenePipeline(
        model, params, models_bank, size_filter=False
    )
    inst_to_class = {
        int(i): int(frame["class_ids"][k])
        for k, i in enumerate(frame["instance_ids"])
    }
    results = pipe.process_frame(
        frame["rgb"].astype(np.float32),
        frame["depth"],
        frame["intrinsic_matrix"],
        frame["T_cam2world"],
        instance_label=frame["instance_label"],
        instance_to_class=inst_to_class,
        refine=args.refine,
    )
    print(f"estimated {len(results)} poses")

    seg_view = viz.draw_instance_segmentation(
        frame["rgb"], frame["instance_label"]
    )
    class_ids = [r["class_id"] for r in results.values()]
    Ts = [r["T_cad2cam"] for r in results.values()]
    overlay = viz.draw_pose_overlay(
        frame["rgb"], models_bank, class_ids, Ts, frame["intrinsic_matrix"]
    )
    panel = viz.tile_images([frame["rgb"], seg_view, overlay])
    viz.save_image(args.out, panel)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
