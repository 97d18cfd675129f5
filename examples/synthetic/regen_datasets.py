#!/usr/bin/env python
"""Regenerate every dataset in docs/EVAL_PROTOCOL.md from its seeds.

One command rebuilds the full /root/data tree after a VM wipe (seventh
as of round 5); every stage is skipped if its packed output already
exists, so a run cut short resumes where it stopped.  Val sets are
fingerprint-verified against the committed artifacts before packing:

- hard val: class-id sequence must match docs/results/
  eval_occ_observed.json 862/862 (EVAL_PROTOCOL.md "hard val").
- textured vals: scene-identity (class ids, GT quaternions,
  translations, origins, pitches, visibilities bit-equal to the
  untextured packed store; only rgb differs).

Usage:
  python examples/synthetic/regen_datasets.py [--stages val easyval train]
      [--train-frames 2200] [--hires]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)
GEN = os.path.join(REPO, "examples", "synthetic", "generate_data.py")
DATA = os.environ.get("MFTPU_DATA", "/root/data")


def run_gen(out, *extra):
    if os.path.exists(os.path.join(out, "meta.json")):
        print(f"[regen] {out}: reindexed dir exists, skipping generation")
        return
    cmd = [sys.executable, GEN, "--out", out] + list(extra)
    print("[regen]", " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True)
    print(f"[regen] {out} done in {time.time() - t0:.0f}s", flush=True)


def pack(reindexed, packed):
    if os.path.exists(os.path.join(packed, "scalars.npz")):
        print(f"[regen] {packed}: packed store exists, skipping")
        return
    from morefusion_tpu import datasets

    datasets.packed.pack_reindexed(reindexed, packed)
    print(f"[regen] packed {packed}", flush=True)


def packed_scalars(packed):
    import numpy as np

    return dict(np.load(os.path.join(packed, "scalars.npz")))


def verify_hard_val(packed):
    import numpy as np

    ref = json.load(
        open(os.path.join(REPO, "docs/results/eval_occ_observed.json"))
    )["records"]["class_id"]
    got = packed_scalars(packed)["class_id"].tolist()
    assert len(got) == len(ref) == 862, (len(got), len(ref))
    n_match = int(np.sum(np.asarray(got) == np.asarray(ref)))
    assert n_match == 862, f"class sequence mismatch: {n_match}/862"
    print(f"[regen] hard val fingerprint OK ({n_match}/862)", flush=True)


def verify_hires_val(packed, plain_packed):
    """480x640 re-renders are NOT crop-identical to the 240x320 val:
    resolution changes which barely-visible instances clear the reindex
    inclusion bar (round 4 measured 870 crops vs 862,
    docs/results/r4_hires_val.json). Fingerprint = the committed
    round-4 hires class sequence, plus the structural property that the
    862-crop low-res sequence is an ordered subsequence of the hires
    one (same scenes, a few extra now-visible instances)."""
    import numpy as np

    got = packed_scalars(packed)["class_id"].tolist()
    ref_path = os.path.join(REPO, "docs/results/r4_hires_val.json")
    ref = json.load(open(ref_path))["records"]["morefusion"]["class_id"]
    assert got == list(ref), (
        f"hires val class sequence mismatch vs r4_hires_val.json "
        f"({len(got)} vs {len(ref)} crops)"
    )
    low = packed_scalars(plain_packed)["class_id"].tolist()
    it = iter(got)
    assert all(c in it for c in low), (
        "862-crop low-res sequence is not a subsequence of hires"
    )
    print(f"[regen] hires val fingerprint OK ({len(got)} crops)",
          flush=True)


def verify_scene_identity(tex_packed, plain_packed):
    import numpy as np

    a, b = packed_scalars(tex_packed), packed_scalars(plain_packed)
    for k in (
        "class_id", "quaternion_true", "translation_true", "origin",
        "pitch", "visibility",
    ):
        assert np.array_equal(a[k], b[k]), f"scene identity broken: {k}"
    print(f"[regen] {tex_packed} scene-identical to {plain_packed}", flush=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--stages", nargs="+",
        default=["val", "easyval", "train"],
        choices=["val", "easyval", "train", "hires", "easyval-hires"],
    )
    p.add_argument("--train-frames", type=int, default=2200)
    p.add_argument("--train-seed", type=int, default=44000)
    args = p.parse_args()
    os.makedirs(DATA, exist_ok=True)

    hard = ["--split", "val", "--n-frames", "115", "--n-objects", "8",
            "14", "--seed", "1", "--settle", "drop"]
    easy = ["--split", "val", "--n-frames", "55", "--n-objects", "3", "6",
            "--seed", "1", "--settle", "drop"]

    if "val" in args.stages:
        run_gen(f"{DATA}/val_reindexed", *hard)
        pack(f"{DATA}/val_reindexed", f"{DATA}/val_packed")
        verify_hard_val(f"{DATA}/val_packed")
        run_gen(f"{DATA}/val_tex_reindexed", *hard, "--textured")
        pack(f"{DATA}/val_tex_reindexed", f"{DATA}/val_tex_packed")
        verify_scene_identity(f"{DATA}/val_tex_packed", f"{DATA}/val_packed")

    if "easyval" in args.stages:
        run_gen(f"{DATA}/easyval_s1_reindexed", *easy)
        pack(f"{DATA}/easyval_s1_reindexed", f"{DATA}/easyval_s1_packed")
        run_gen(f"{DATA}/easyval_tex_reindexed", *easy, "--textured")
        pack(f"{DATA}/easyval_tex_reindexed", f"{DATA}/easyval_tex_packed")
        verify_scene_identity(
            f"{DATA}/easyval_tex_packed", f"{DATA}/easyval_s1_packed"
        )

    if "train" in args.stages:
        run_gen(
            f"{DATA}/train_tex_s{args.train_seed}_reindexed",
            "--split", "train", "--n-frames", str(args.train_frames),
            "--n-objects", "8", "14", "--seed", str(args.train_seed),
            "--textured",
        )
        pack(
            f"{DATA}/train_tex_s{args.train_seed}_reindexed",
            f"{DATA}/train_tex_s{args.train_seed}_packed",
        )

    if "hires" in args.stages:
        # 480x640 renders of the SAME seed-1 scenes / seed-44000 train
        # scenes (EVAL_PROTOCOL.md hi-res row: placement consumes the
        # generator RNG before rendering, so content is identical).
        run_gen(
            f"{DATA}/val_tex_hires_reindexed", *hard, "--textured",
            "--image-shape", "480", "640",
        )
        pack(
            f"{DATA}/val_tex_hires_reindexed", f"{DATA}/val_tex_hires_packed"
        )
        verify_hires_val(
            f"{DATA}/val_tex_hires_packed", f"{DATA}/val_packed"
        )
        run_gen(
            f"{DATA}/train_tex_hires_s{args.train_seed}_reindexed",
            "--split", "train", "--n-frames", str(args.train_frames),
            "--n-objects", "8", "14", "--seed", str(args.train_seed),
            "--textured", "--image-shape", "480", "640",
        )
        pack(
            f"{DATA}/train_tex_hires_s{args.train_seed}_reindexed",
            f"{DATA}/train_tex_hires_s{args.train_seed}_packed",
        )

    if "easyval-hires" in args.stages:
        # 480x640 renders of the SAME easy seed-1 scenes, for evaluating
        # hires-trained checkpoints on a resolution-matched easy val.
        # No committed class-sequence fingerprint exists yet for this
        # set, so the first generation's sequence becomes the reference
        # the moment an eval artifact lands (EVAL_PROTOCOL.md policy);
        # scene identity vs easyval_s1 cannot be asserted crop-for-crop
        # (resolution changes reindex visibility inclusion, same as the
        # hard hires val).
        run_gen(
            f"{DATA}/easyval_tex_hires_reindexed", *easy, "--textured",
            "--image-shape", "480", "640",
        )
        pack(
            f"{DATA}/easyval_tex_hires_reindexed",
            f"{DATA}/easyval_tex_hires_packed",
        )

    print("[regen] all requested stages complete")


if __name__ == "__main__":
    main()
