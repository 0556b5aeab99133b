"""RMSE/PSNR comparison between two renders (PNG, HDR, or NPZ checkpoints).

The BASELINE quality target is <1% RMSE against the GLSL reference at equal
spp; this is the measurement tool (the GL renderer itself cannot run in
this environment — feed it images rendered elsewhere).

Usage: python scripts/compare_rmse.py a.png b.png [--tonemapped]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_any(path):
    if path.endswith(".npz"):
        return np.load(path)["framebuffer"][..., :3].astype(np.float32)
    if path.endswith(".hdr"):
        from volren_tpu.utils.hdr import read_hdr

        return read_hdr(path)
    from PIL import Image

    return np.asarray(Image.open(path), np.float32)[..., :3] / 255.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image_a")
    p.add_argument("image_b")
    p.add_argument("--flip-a", action="store_true", help="flip A vertically")
    p.add_argument("--flip-b", action="store_true", help="flip B vertically")
    p.add_argument(
        "--resize-b",
        action="store_true",
        help="box-downscale B to A's resolution (e.g. compare a reduced-res "
        "render against the reference's published 1024^2 image)",
    )
    args = p.parse_args()
    a = load_any(args.image_a)
    b = load_any(args.image_b)
    if args.flip_a:
        a = a[::-1]
    if args.flip_b:
        b = b[::-1]
    if args.resize_b and a.shape != b.shape:
        from PIL import Image

        img = Image.fromarray(np.clip(b * 255.0, 0, 255).astype(np.uint8))
        img = img.resize((a.shape[1], a.shape[0]), Image.BOX)
        b = np.asarray(img, np.float32) / 255.0
    if a.shape != b.shape:
        raise SystemExit(f"shape mismatch: {a.shape} vs {b.shape}")
    diff = a - b
    rmse = float(np.sqrt(np.mean(diff**2)))
    denom = float(np.sqrt(np.mean(b**2)))
    rel = rmse / max(denom, 1e-12)
    peak = max(float(b.max()), 1e-12)
    psnr = 20 * np.log10(peak / max(rmse, 1e-12))
    print(f"RMSE:          {rmse:.6f}")
    print(f"relative RMSE: {rel * 100:.3f}%")
    print(f"PSNR:          {psnr:.2f} dB")
    return 0 if rel < 0.01 else 1


if __name__ == "__main__":
    sys.exit(main())
