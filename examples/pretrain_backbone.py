#!/usr/bin/env python
"""Self-supervised backbone pretraining on procedural renders (RotNet).

Zero-egress substitute for the reference's ImageNet-initialized ResNet18
(``morefusion/models/resnet.py:7-52``; the torchvision download is
environment-impossible here): pretrain the SAME ``DilatedResNet18``
module the flagship instantiates (``models/singleview_3d.py`` setup,
``self.resnet_extractor``) on a rotation-canonicalization pretext over
the packed procedural RGB crops (Gidaris et al. 2018 "Unsupervised
representation learning by predicting image rotations" — recognizing a
crop's 0/90/180/270 rotation needs object-level structure, exactly what
the pose head later consumes).

Exports the backbone subtree as a git-committable bf16 npz whose tree
shape matches ``{'resnet_extractor': params}``; ``train.py
--pretrained-backbone`` grafts it under the flagship's param tree while
everything else keeps its fresh random init (the backbone-init A/B).

Usage:
  python examples/pretrain_backbone.py --out /root/runs/ssl \
      --data /root/data/train_tex_hires_s44000_packed [more packed dirs]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--data", nargs="+", required=True,
                   help="packed store dirs (rgb.npy memmaps)")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--width", type=int, default=64,
                   help="DilatedResNet18 base width (flagship default 64)")
    p.add_argument("--n-val", type=int, default=512)
    p.add_argument("--eval-interval", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax

    from morefusion_tpu.models.resnet import DilatedResNet18
    from morefusion_tpu.training.checkpoints import export_params_npz

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=1)

    rgbs = [
        np.load(os.path.join(d, "rgb.npy"), mmap_mode="r")
        for d in args.data
    ]
    sizes = np.array([len(r) for r in rgbs])
    total = int(sizes.sum())
    print(f"pretrain crops: {sizes.tolist()} (total {total})", flush=True)
    rng = np.random.default_rng(args.seed)
    # held-out indices for pretext-accuracy reporting
    val_idx = rng.choice(total, size=min(args.n_val, total), replace=False)
    val_mask = np.zeros(total, bool)
    val_mask[val_idx] = True
    train_idx = np.nonzero(~val_mask)[0]

    def fetch(global_idx):
        out = np.empty(
            (len(global_idx),) + rgbs[0].shape[1:], np.uint8
        )
        for j, g in enumerate(global_idx):
            s = int(np.searchsorted(np.cumsum(sizes), g, side="right"))
            local = int(g - (np.cumsum(sizes)[s - 1] if s else 0))
            out[j] = rgbs[s][local]
        return out

    class RotNet(nn.Module):
        base_width: int = 64

        def setup(self):
            # name must match the flagship's attribute so the exported
            # subtree grafts 1:1 (singleview_3d.py setup)
            self.resnet_extractor = DilatedResNet18(
                base_width=self.base_width, dtype=jnp.bfloat16
            )
            self.rot_head = nn.Dense(4)

        def __call__(self, rgb):
            h = self.resnet_extractor(rgb)  # (B, H/8, W/8, 8w)
            h = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
            return self.rot_head(h)

    model = RotNet(base_width=args.width)
    example = jnp.zeros((args.batch_size,) + rgbs[0].shape[1:], jnp.uint8)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), example)
    warmup = min(args.warmup_steps, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, max(args.steps, warmup + 1)
    )
    tx = optax.adam(sched)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rgb, label):
        def loss_fn(p):
            logits = model.apply(p, rgb)
            ll = optax.softmax_cross_entropy_with_integer_labels(
                logits, label
            )
            acc = jnp.mean(jnp.argmax(logits, -1) == label)
            return jnp.mean(ll), acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss, acc

    @jax.jit
    def infer(params, rgb):
        return jnp.argmax(model.apply(params, rgb), -1)

    def make_batch(idx):
        rgb = fetch(idx)
        ks = rng.integers(0, 4, size=len(idx))
        rot = np.stack(
            [np.rot90(im, k) for im, k in zip(rgb, ks)]
        )
        return rot, ks.astype(np.int32)

    def val_accuracy(params):
        hits = n = 0
        for i in range(0, len(val_idx), args.batch_size):
            chunk = val_idx[i : i + args.batch_size]
            if len(chunk) < args.batch_size:
                break  # static shapes for the jitted path
            rot, ks = make_batch(chunk)
            pred = np.asarray(jax.device_get(infer(params, rot)))
            hits += int((pred == ks).sum())
            n += len(chunk)
        return hits / max(n, 1)

    log_path = os.path.join(args.out, "log.jsonl")
    t0 = time.time()
    running = []
    for it in range(1, args.steps + 1):
        idx = rng.choice(train_idx, size=args.batch_size, replace=False)
        rot, ks = make_batch(idx)
        params, opt, loss, acc = step(params, opt, rot, ks)
        running.append(float(acc))
        if it % 50 == 0:
            print(
                f"step {it}: loss={float(loss):.4f} "
                f"acc(train,50)={np.mean(running[-50:]):.3f}",
                flush=True,
            )
        if it % args.eval_interval == 0 or it == args.steps:
            va = val_accuracy(params)
            with open(log_path, "a") as f:
                f.write(json.dumps({
                    "step": it, "val_acc": va,
                    "train_acc_50": float(np.mean(running[-50:])),
                    "elapsed": time.time() - t0,
                }) + "\n")
            print(f"step {it}: val rotation acc {va:.3f}", flush=True)

    out_npz = os.path.join(args.out, "backbone_bf16.npz")
    export_params_npz(
        {"resnet_extractor": params["params"]["resnet_extractor"]}, out_npz
    )
    print(f"exported backbone subtree to {out_npz}", flush=True)


if __name__ == "__main__":
    main()
