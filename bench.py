"""Benchmark: single-view volumetric pose-prediction FPS on one TPU chip.

Headline metric vs. the driver-set target (BASELINE.json north star):
>= 30 FPS single-view prediction with the full flagship model
(SingleView3D + occupancy branch, 256x256 instance crop, 1000 points,
32^3 grid). Prints ONE JSON line.

Trustworthiness (VERDICT r3 item 4): by default this script is an
orchestrator — it re-executes itself ``--runs`` times (default 5) in
FRESH processes with a persistent XLA compilation cache, and reports
the MEDIAN with min/max spread plus an achieved-TFLOP/s / MFU figure
from XLA cost analysis. Cross-process relay variance (the 257->198 FPS
"regression" between rounds 1 and 3 was exactly this) is thereby
bounded in every committed number:
  {"metric": ..., "value": <median>, "unit": ..., "vs_baseline": ...,
   "spread": {"min": ..., "max": ..., "runs": N},
   "tflops": ..., "mfu": ...}

``--single`` runs one in-process measurement (what each subprocess
does). ``--metric train`` measures the full fp32 train step (batch 16)
instead of inference. ``--quick`` shrinks iterations for CPU smoke.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# TPU v5e peak (bf16 dense): the MFU denominator for every metric.
PEAK_TFLOPS_BF16 = 197.0


def _flops_of(lowered_compiled):
    """flops from XLA cost analysis (dict or [dict] across versions)."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _emit(metric, value, unit, baseline, extra=None):
    rec = {
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": round(value / baseline, 3),
    }
    rec.update(extra or {})
    print(json.dumps(rec))


def bench_icc(args):
    """Secondary metric: ICC joint-refinement iterations/s (target 100)."""
    import jax
    import jax.numpy as jnp

    from morefusion_tpu.contrib.collision_refine import refine_collision

    N, M, V = 8, 2048, 32
    rng = np.random.RandomState(0)
    base = dict(
        points=jnp.asarray(
            rng.uniform(-0.05, 0.05, (N, M, 3)).astype(np.float32)
        ),
        sdf=jnp.asarray(rng.uniform(0, 0.02, (N, M)).astype(np.float32)),
        point_mask=jnp.ones((N, M), bool),
        pitch=jnp.full((N,), 0.01, jnp.float32),
        origin=jnp.full((N, 3), -0.16, jnp.float32),
        grid_target=jnp.asarray(rng.rand(N, V, V, V).astype(np.float32)),
        grid_nontarget_empty=jnp.asarray(
            rng.rand(N, V, V, V).astype(np.float32)
        ),
    )
    q0 = jnp.asarray(np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1)))
    ts = [
        jnp.asarray(rng.uniform(-0.05, 0.05, (N, 3)).astype(np.float32))
        for _ in range(args.iters + 1)
    ]
    out = refine_collision(q0, ts[0], **base, iterations=30)
    _ = jax.device_get(out[1])
    t0 = time.perf_counter()
    for k in range(args.iters):
        out = refine_collision(q0, ts[k + 1], **base, iterations=30)
        _ = jax.device_get(out[1])
    dt = (time.perf_counter() - t0) / args.iters
    _emit(
        "icc_refinement_iters_per_s", 30.0 / dt, "iters/s", 100.0
    )
    return 0


def bench_pipeline(args):
    """Tertiary metric: full scene-pipeline FPS (fusion -> pose CNN ->
    object mapping -> ICC joint refinement) on synthetic frames with GT
    segmentation (the reference runs its Mask R-CNN in a separate
    process/GPU, so segmentation is outside this loop there too)."""
    import jax
    import jax.numpy as jnp

    from morefusion_tpu import runtime
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.models import SingleView3D
    from morefusion_tpu.simulation import PlaneTypeSceneGeneration

    models_bank = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models_bank, n_object=4, random_state=np.random.RandomState(1)
    )
    gen.generate()
    traj = gen.random_camera_trajectory(5, 3)
    frames = [
        gen.render_frame(T, shape=(240, 320), n_points_per_object=20000)
        for T in traj[: args.iters + 2]
    ]

    model = SingleView3D(
        n_fg_class=21,
        with_occupancy=True,
        compute_dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        class_id=np.ones(1, np.int32),
        rgb=rng.rand(1, 256, 256, 3).astype(np.float32),
        pcd=rng.rand(1, 256, 256, 3).astype(np.float32),
        pitch=np.ones(1, np.float32) * 0.01,
        grid_nontarget_empty=np.zeros((1, 32, 32, 32), np.float32),
    )
    segmenter = None
    if args.segmenter:
        # trained UNet instance segmentation instead of GT labels — the
        # full detector->fusion->pose->refine serve path
        import optax

        from morefusion_tpu import training
        from morefusion_tpu.models.segmentation import (
            SegmentationNode,
            UNetSegmentation,
        )
        from morefusion_tpu.training.trainer import TrainState

        seg_args = training.load_args(args.segmenter)
        seg_model = UNetSegmentation(
            n_class=22,
            widths=tuple(seg_args.get("widths", (32, 64, 128, 256))),
            with_boundary=not seg_args.get("no_boundary", False),
            use_depth=seg_args.get("use_depth", False),
        )
        seg_rng = np.random.RandomState(0)
        seg_init_kw = {}
        if seg_model.use_depth:
            seg_init_kw["depth"] = seg_rng.rand(1, 240, 320).astype(
                np.float32
            )
        seg_params = jax.jit(
            lambda r, x: seg_model.init(r, x, **seg_init_kw)
        )(
            jax.random.PRNGKey(seg_args.get("seed", 0)),
            seg_rng.rand(1, 240, 320, 3).astype(np.float32),
        )
        seg_state = TrainState.create(
            apply_fn=seg_model.apply, params=seg_params,
            tx=optax.adam(seg_args.get("lr", 1e-3)),
        )
        mgr = training.CheckpointManager(args.segmenter)
        restored = mgr.restore_latest(seg_state)
        if restored is None:
            raise SystemExit(f"no checkpoint in {args.segmenter}")
        segmenter = SegmentationNode(seg_model, restored.params)

    pipe = runtime.ScenePipeline(
        model, params, models_bank, segmenter=segmenter,
        native_mapping=True, size_filter=False, async_refine=True,
    )
    pipe.warmup()

    def to_stream_frame(frame):
        sf = dict(
            rgb=frame["rgb"].astype(np.float32),
            depth=frame["depth"],
            K=frame["intrinsic_matrix"],
            T_cam2world=frame["T_cam2world"],
        )
        if segmenter is None:
            sf["instance_label"] = frame["instance_label"]
            sf["instance_to_class"] = {
                int(i): int(frame["class_ids"][k])
                for k, i in enumerate(frame["instance_ids"])
            }
        return sf

    # two warm replays: the second reproduces exactly the fusion/spawn
    # state sequence the timed pass will see, so every instance-count
    # bucket's pose-forward and ICC-scan programs compile outside the
    # timed region
    for _ in range(2):
        for _out in pipe.process_stream(map(to_stream_frame, frames)):
            pass
        pipe.reset()

    # timed pass: software-pipelined stream (frame k's device pose
    # overlaps frame k+1's host fusion/extraction — runtime/pipeline.py
    # process_stream)
    stream = (
        to_stream_frame(frames[k % len(frames)])
        for k in range(args.iters)
    )
    t0 = time.perf_counter()
    n = 0
    for out in pipe.process_stream(stream):
        n += len(out)
    pipe.flush_refine()
    dt = (time.perf_counter() - t0) / args.iters
    _emit("scene_pipeline_fps", 1.0 / dt, "fps", 10.0)
    return 0


def bench_train(args):
    """Train-step metric: full fp32 flagship train step (batch 16,
    occupancy branch + occupancy loss term) — ms/step + MFU."""
    import jax

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    from examples.profile_train import make_batch

    from morefusion_tpu import models
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.training import trainer as trainer_module

    B = args.batch_size if args.batch_size > 1 else 16
    batch = make_batch(B)
    bank = trainer_module.CadPointBank.build(
        ProceduralModels(), 21, with_solid=True
    )
    model = models.SingleView3D(n_fg_class=21, with_occupancy=True)
    rng = jax.random.PRNGKey(0)
    state = trainer_module.create_train_state(
        model, batch, rng, with_occupancy=True
    )
    step = trainer_module.make_train_step(
        model, bank, with_occupancy=True, occupancy_loss_term=True
    )
    jb = {k: np.asarray(v) for k, v in batch.items()}
    sym = np.bool_(True)

    jstep = jax.jit(step)
    flops = _flops_of(jstep.lower(state, jb, sym, rng).compile())

    state, m = jstep(state, jb, sym, rng)
    jax.device_get(m["loss"])
    for _ in range(args.warmup):
        state, m = jstep(state, jb, sym, rng)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = jstep(state, jb, sym, rng)
    jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    extra = {}
    if flops:
        tf = flops / dt / 1e12
        extra = {
            "tflops": round(tf, 2),
            "mfu": round(tf / PEAK_TFLOPS_BF16, 4),
        }
    # target: VERDICT r3 item 7 — fp32 train step <= 160 ms
    _emit("train_step_ms", dt * 1e3, "ms", 160.0, extra)
    return 0


def bench_fps(args):
    import jax
    import jax.numpy as jnp

    from morefusion_tpu.models import SingleView3D

    B, H, W = args.batch_size, 256, 256
    model = SingleView3D(
        n_fg_class=21,
        with_occupancy=True,
        compute_dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
    )

    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (B, H, W, 3)).astype(np.float32)
    pcd = rng.uniform(0.3, 0.8, (B, H, W, 3)).astype(np.float32)
    pcd[:, : H // 5] = np.nan
    class_id = rng.randint(1, 22, (B,)).astype(np.int32)
    pitch = np.full((B,), 0.0075, np.float32)
    grid = rng.uniform(0, 1, (B, 32, 32, 32)).astype(np.float32)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        class_id=class_id, rgb=rgb, pcd=pcd, pitch=pitch,
        grid_nontarget_empty=grid,
    )

    @jax.jit
    def predict(params, class_id, rgb, pcd, pitch, grid):
        return model.apply(
            params, class_id=class_id, rgb=rgb, pcd=pcd, pitch=pitch,
            grid_nontarget_empty=grid,
        )

    # device-resident inputs so we measure compute, not H2D
    inputs = jax.device_put((params, class_id, rgb, pcd, pitch, grid))
    flops = _flops_of(predict.lower(*inputs).compile())

    # NOTE: jax.block_until_ready does not reliably block through the
    # remote TPU relay in this environment; a device->host readback does.
    for _ in range(args.warmup):
        out = predict(*inputs)
    _ = jax.device_get(out[2])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = predict(*inputs)
    _ = jax.device_get(out[2])  # forces completion of the whole chain
    dt = time.perf_counter() - t0

    fps = args.iters * B / dt
    extra = {}
    if flops:
        tf = flops * args.iters / dt / 1e12
        extra = {
            "tflops": round(tf, 2),
            "mfu": round(tf / PEAK_TFLOPS_BF16, 4),
        }
    # driver target: >=30 FPS single-view prediction
    _emit("pose_inference_fps", fps, "fps", 30.0, extra)
    return 0


REPO_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_cache")


def _seed_cache(cache_dir):
    """Seed the XLA compile cache from the committed repo copy.

    VM wipes (seven so far) empty /root/.jax_cache; a cold first compile
    of the flagship graph is ~4.5 min, which is what reduced BENCH_r04 to
    a single run inside the 420 s budget (VERDICT r4 weak #2). The bench
    programs' cache entries are ~11 MB total, so the repo commits them:
    every run — including the driver's end-of-round one on a fresh VM —
    starts warm. Key misses (XLA upgrade etc.) just fall back to a cold
    compile.
    """
    if not os.path.isdir(REPO_CACHE):
        return
    os.makedirs(cache_dir, exist_ok=True)
    import shutil

    for name in os.listdir(REPO_CACHE):
        dst = os.path.join(cache_dir, name)
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(REPO_CACHE, name), dst)


def _update_repo_cache(cache_dir):
    import shutil

    os.makedirs(REPO_CACHE, exist_ok=True)
    for name in os.listdir(cache_dir):
        dst = os.path.join(REPO_CACHE, name)
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(cache_dir, name), dst)
            print(f"[bench] cached {name} -> bench_cache/",
                  file=sys.stderr)


def orchestrate(args, argv):
    """Median-of-N fresh-process runs with a shared compilation cache."""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    os.makedirs(env["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
    _seed_cache(env["JAX_COMPILATION_CACHE_DIR"])
    cmd = [sys.executable, os.path.abspath(__file__), "--single"] + argv
    records = []
    t0 = time.perf_counter()
    durations = []
    for k in range(args.runs):
        # Wall-budget guard: a cold XLA cache makes the first run ~3x
        # slower than the rest; never start a run that would push the
        # orchestrator past --budget (median of what completed is still
        # emitted). At least one run always happens.
        if records:
            # Estimate the next run at the FASTEST completed duration:
            # run 1 may be a cold-cache outlier (~3x warm), and with the
            # repo-seeded cache warm runs are the steady state. Using
            # durations[-1] here is what stopped BENCH_r04 at 1/5 runs.
            expected = min(durations)
            if time.perf_counter() - t0 + expected > args.budget:
                print(
                    f"[bench] budget {args.budget:.0f}s: stopping after "
                    f"{len(records)}/{args.runs} runs",
                    file=sys.stderr,
                )
                break
        t_run = time.perf_counter()
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, env=env,
                timeout=1800,
            )
            line = [
                ln for ln in out.stdout.strip().splitlines()
                if ln.startswith("{")
            ][-1]
            records.append(json.loads(line))
        except Exception as e:  # one bad relay run must not kill the bench
            print(f"[bench] run {k} failed: {e!r}", file=sys.stderr)
        durations.append(time.perf_counter() - t_run)
    if not records:
        print(json.dumps({"metric": "error", "value": 0, "unit": "none",
                          "vs_baseline": 0}))
        return 1
    vals = sorted(r["value"] for r in records)
    med = vals[len(vals) // 2] if len(vals) % 2 else 0.5 * (
        vals[len(vals) // 2 - 1] + vals[len(vals) // 2]
    )
    r0 = records[0]
    baseline = r0["value"] / r0["vs_baseline"] if r0["vs_baseline"] else 1.0
    extra = {
        "spread": {
            "min": vals[0], "max": vals[-1], "runs": len(records),
        }
    }
    for key in ("tflops", "mfu"):
        kv = sorted(r[key] for r in records if key in r)
        if kv:
            extra[key] = kv[len(kv) // 2]
    if args.update_cache:
        _update_repo_cache(env["JAX_COMPILATION_CACHE_DIR"])
    _emit(r0["metric"], med, r0["unit"], baseline, extra)
    return 0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--quick", action="store_true")
    parser.add_argument(
        "--runs", type=int, default=None,
        help="fresh-process repetitions to median over (default 5; "
        "3 for the heavier pipeline/train metrics)",
    )
    parser.add_argument(
        "--single", action="store_true",
        help="one in-process measurement (no subprocess median)",
    )
    parser.add_argument(
        "--budget", type=float, default=420.0,
        help="orchestrator wall budget in seconds; stop launching "
        "fresh-process runs that would exceed it (cold-cache runs on a "
        "freshly wiped VM take ~4.5 min each, warm ~1.6 min)",
    )
    parser.add_argument(
        "--metric", default="fps",
        choices=["fps", "icc", "pipeline", "train"],
        help="headline metric (fps), refinement throughput (icc), "
        "full scene-pipeline FPS (pipeline), or train-step ms (train)",
    )
    parser.add_argument(
        "--segmenter", default=None,
        help="(pipeline metric) UNet checkpoint dir: run the pipeline "
        "with predicted instance masks instead of GT labels",
    )
    parser.add_argument(
        "--update-cache", action="store_true",
        help="after the runs, copy new XLA cache entries into the "
        "committed bench_cache/ dir (run once per program change, then "
        "git add bench_cache)",
    )
    parser.add_argument(
        "--fp32", action="store_true",
        help="fp32 activation compute instead of the bf16 serving "
        "default (bf16 is ~1.5x faster and measured accuracy-neutral: "
        "identical ADD AUC / <2cm on the validation set)",
    )
    args = parser.parse_args()
    if args.runs is None:
        args.runs = 3 if args.metric in ("pipeline", "train") else 5
    if not args.single:
        argv = [a for a in sys.argv[1:] if a != "--single"]
        return orchestrate(args, argv)
    if args.quick:
        args.iters, args.warmup = 3, 1
    if args.metric == "icc":
        args.iters = min(args.iters, 15)
        return bench_icc(args)
    if args.metric == "pipeline":
        args.iters = min(args.iters, 12)
        return bench_pipeline(args)
    if args.metric == "train":
        args.iters = min(args.iters, 20)
        args.warmup = min(args.warmup, 3)
        return bench_train(args)
    return bench_fps(args)


if __name__ == "__main__":
    sys.exit(main())
