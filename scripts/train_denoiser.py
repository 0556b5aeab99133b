"""Train the UNet denoiser on datagen_denoise.py output.

Usage:
    python scripts/datagen_denoise.py          # produces dataset_{input,target}.h5
    python scripts/train_denoiser.py dataset_input.h5 dataset_target.h5

Random patches are sampled from the fp16 (N, 3, H, W) pairs; training runs
jitted on the default backend (bf16 convs on the TPU MXU).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from volren_tpu.models.denoiser import (
    create_train_state,
    load_params,
    save_params,
    train_step,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input_h5")
    p.add_argument("target_h5")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--patch", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--output", default="denoiser_params.pkl")
    p.add_argument("--resume", default=None)
    args = p.parse_args()

    import h5py

    fin = h5py.File(args.input_h5, "r")["color"]
    ftg = h5py.File(args.target_h5, "r")["color"]
    n, _, h, w = fin.shape
    print(f"dataset: {n} pairs at {w}x{h}")

    rng = np.random.default_rng(0)
    model, params, tx, opt_state = create_train_state(
        jax.random.PRNGKey(0), lr=args.lr, patch=args.patch
    )
    if args.resume:
        params = load_params(args.resume)

    def batch():
        idx = rng.integers(0, n, args.batch)
        ys = rng.integers(0, h - args.patch + 1, args.batch)
        xs = rng.integers(0, w - args.patch + 1, args.batch)
        noisy = np.stack(
            [fin[i, :, y : y + args.patch, x : x + args.patch] for i, y, x in zip(idx, ys, xs)]
        ).astype(np.float32)
        clean = np.stack(
            [ftg[i, :, y : y + args.patch, x : x + args.patch] for i, y, x in zip(idx, ys, xs)]
        ).astype(np.float32)
        return noisy, clean

    apply_fn = model.apply
    t0 = time.time()
    for step in range(1, args.steps + 1):
        noisy, clean = batch()
        params, opt_state, loss = train_step(apply_fn, tx, params, opt_state, noisy, clean)
        if step % 50 == 0 or step == 1:
            print(
                f"step {step:5d}: loss {float(loss):.5f} "
                f"({step / (time.time() - t0):.1f} it/s)",
                flush=True,
            )
        if step % 500 == 0:
            save_params(args.output, params)
    save_params(args.output, params)
    print(f"{args.output} written.")


if __name__ == "__main__":
    main()
