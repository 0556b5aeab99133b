"""Neural style transfer — TPU-native JAX port.

Port of the reference scripts/styletransfer.py (torch/VGG11): Adam gradient
descent directly on pixels with VGG11 content loss + Gram-matrix SMAPE
style loss, masked by content > 0 (styletransfer.py:47-73,103-133). The
optimization runs in JAX (optax Adam + exponential LR decay, gradient value
clipping) so it uses the TPU.

VGG11 weights are loaded from torchvision's local cache when present
(downloading is impossible in a zero-egress environment); otherwise the
script falls back to fixed random features, which still transfers coarse
color statistics but not learned texture.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax
from PIL import Image

# VGG11 'features' architecture: conv(out_ch) / M = maxpool
VGG11_CFG = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]


def load_vgg11_params(seed=0):
    """Conv weights from torchvision's cached VGG11 if available, else
    He-initialized random filters."""
    try:
        import glob

        import torch

        # look for an already-downloaded checkpoint ONLY: calling
        # torchvision with weights=DEFAULT would try to download and hang
        # forever in a zero-egress environment (no exception to catch)
        hub_dir = os.environ.get(
            "TORCH_HOME", os.path.expanduser("~/.cache/torch")
        )
        cached = glob.glob(os.path.join(hub_dir, "hub", "checkpoints", "vgg11-*.pth"))
        if not cached:
            raise FileNotFoundError("no cached vgg11 checkpoint")
        import torchvision

        model = torchvision.models.vgg11().features
        model.load_state_dict(
            {
                k.removeprefix("features."): v
                for k, v in torch.load(cached[0], map_location="cpu").items()
                if k.startswith("features.")
            }
        )
        params = []
        for layer in model.children():
            if isinstance(layer, torch.nn.Conv2d):
                w = jnp.asarray(layer.weight.detach().numpy())  # (out, in, kh, kw)
                b = jnp.asarray(layer.bias.detach().numpy())
                params.append((w, b))
        print("using pretrained VGG11 features")
        return params
    except Exception as e:
        print(f"pretrained VGG11 unavailable ({type(e).__name__}); using random features")
        rng = np.random.default_rng(seed)
        params = []
        in_ch = 3
        for v in VGG11_CFG:
            if v == "M":
                continue
            fan_in = in_ch * 9
            w = rng.normal(0, np.sqrt(2.0 / fan_in), size=(v, in_ch, 3, 3)).astype(
                np.float32
            )
            params.append((jnp.asarray(w), jnp.zeros((v,), jnp.float32)))
            in_ch = v
        return params


def vgg_features(params, x):
    """x: (1, 3, H, W). Returns post-ReLU activations of every conv."""
    feats = []
    pi = 0
    for v in VGG11_CFG:
        if v == "M":
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
            continue
        w, b = params[pi]
        pi += 1
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NCHW", "OIHW", "NCHW")
        ) + b[None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def l2(a, b):
    return jnp.mean((a - b) ** 2)


def smape(a, b):
    return jnp.mean(jnp.abs(a - b) / (jnp.abs(a) + jnp.abs(b) + 0.1))


def gram_matrix(x):
    b, c, h, w = x.shape
    t = x.reshape(b * c, h * w)
    return (t @ t.T) / (b * c * h * w)


def style_loss_fn(params, image, content, style, content_weight, style_weight):
    mask = jnp.where(content > 0, 1.0, 0.0)
    feats_i = vgg_features(params, mask * image)
    feats_c = vgg_features(params, content)
    feats_s = vgg_features(params, style)
    feature_loss = 0.0
    style_loss = 0.0
    for fi, fc, fs in zip(feats_i, feats_c, feats_s):
        feature_loss += content_weight * l2(fi, fc)
        style_loss += style_weight * smape(gram_matrix(fi), gram_matrix(fs))
    return (feature_loss + style_loss) / len(feats_i)


def load_image(path, device_size=None):
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return jnp.asarray(img.transpose(2, 0, 1)[None])  # (1, 3, H, W)


def resize(img, size):
    return jax.image.resize(img, (1, 3, size[0], size[1]), method="bicubic")


def main():
    p = argparse.ArgumentParser(description="Neural style transfer (JAX)")
    p.add_argument("content_path")
    p.add_argument("style_path")
    p.add_argument("-e", "--epochs", type=int, default=1000)
    p.add_argument("-lr", "--learning_rate", type=float, default=0.1)
    p.add_argument("-b1", "--beta1", type=float, default=0.9)
    p.add_argument("-b2", "--beta2", type=float, default=0.999)
    p.add_argument("-c", "--clip", type=float, default=1.0)
    p.add_argument("-g", "--gamma", type=float, default=0.999)
    p.add_argument("--save_epochs", type=int, default=50)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--content", type=float, default=1.0)
    p.add_argument("--style", type=float, default=3000.0)
    p.add_argument("--noise", action="store_true")
    p.add_argument("--output", default="styletransfer.png")
    p.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (the JAX_PLATFORMS env var is overridden "
        "by this environment's TPU site hook, so tests pass a flag instead)",
    )
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    content = load_image(args.content_path)
    style = load_image(args.style_path)
    scale = min(1.0, args.image_size / max(content.shape))
    h = int(content.shape[2] * scale)
    w = int(content.shape[3] * scale)
    content = resize(content, (h, w))
    style = resize(style, (h, w))

    params = load_vgg11_params()
    if args.noise:
        key = jax.random.PRNGKey(0)
        image = jax.random.uniform(key, content.shape) * jnp.where(content > 0, 1.0, 0.0)
    else:
        image = content

    sched = optax.exponential_decay(args.learning_rate, 1, args.gamma)
    opt = optax.chain(
        optax.clip(args.clip),
        optax.scale_by_adam(b1=args.beta1, b2=args.beta2),
        optax.scale_by_learning_rate(sched),
    )
    opt_state = opt.init(image)

    @jax.jit
    def step(image, opt_state):
        loss, grad = jax.value_and_grad(
            lambda im: style_loss_fn(params, im, content, style, args.content, args.style)
        )(image)
        updates, opt_state = opt.update(grad, opt_state, image)
        image = jnp.clip(image + updates, 0.0, 1.0)
        return image, opt_state, loss, jnp.abs(grad).max()

    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        image, opt_state, loss, max_grad = step(image, opt_state)
        if epoch % args.save_epochs == 0 or epoch == args.epochs:
            out = np.asarray(image[0]).transpose(1, 2, 0)
            Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8)).save(args.output)
        dt = time.time() - t0
        print(
            f"Train epoch {epoch:04}: loss: {float(loss):3.6f}, "
            f"max grad: {float(max_grad):4.4f}, time: {dt * 1000:.0f}ms",
            end="\r",
        )
    print("")
    print(f"{args.output} written.")


if __name__ == "__main__":
    main()
