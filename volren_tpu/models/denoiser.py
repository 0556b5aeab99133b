"""Monte-Carlo denoiser: compact UNet over (3, H, W) HDR renders.

Consumes the datasets produced by scripts/datagen_denoise.py (the
reference's workload, datagen_denoise.py:49-52: fp16 'color' (N, 3, H, W)
noisy/converged pairs). Trains with SMAPE loss in log space — robust to the
unbounded dynamic range of HDR path-tracing output.

TPU notes: convolutions run in bf16 (MXU) with f32 accumulation/params;
shapes are NHWC internally (XLA's preferred conv layout on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), dtype=self.dtype, padding="SAME")(x)
            x = nn.silu(x)
        return x


class Denoiser(nn.Module):
    """UNet: encoder/decoder with skip connections, residual output."""

    features: Sequence[int] = (32, 64, 96)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_nchw):
        # log-compress HDR input; predict a residual in log space
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))  # NHWC
        logx = jnp.log1p(jnp.maximum(x, 0.0))
        h = logx.astype(self.dtype)

        skips = []
        for f in self.features[:-1]:
            h = ConvBlock(f, self.dtype)(h)
            skips.append(h)
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = ConvBlock(self.features[-1], self.dtype)(h)
        for f, skip in zip(reversed(self.features[:-1]), reversed(skips)):
            b, hh, ww, c = skip.shape
            h = jax.image.resize(h, (b, hh, ww, h.shape[-1]), "nearest")
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvBlock(f, self.dtype)(h)
        residual = nn.Conv(3, (3, 3), dtype=jnp.float32, padding="SAME")(
            h.astype(jnp.float32)
        )
        out_log = jnp.maximum(logx + residual, 0.0)
        out = jnp.expm1(out_log)
        return jnp.transpose(out, (0, 3, 1, 2))  # back to NCHW


def smape(a, b):
    return jnp.mean(jnp.abs(a - b) / (jnp.abs(a) + jnp.abs(b) + 0.01))


def create_train_state(rng_key, lr=1e-3, patch=64, features=(32, 64, 96)):
    model = Denoiser(features=features)
    params = model.init(rng_key, jnp.zeros((1, 3, patch, patch), jnp.float32))
    tx = optax.adamw(optax.cosine_decay_schedule(lr, 20_000, alpha=0.05))
    opt_state = tx.init(params)
    return model, params, tx, opt_state


@partial(jax.jit, static_argnames=("model_apply", "tx"))
def train_step(model_apply, tx, params, opt_state, noisy, clean):
    def loss_fn(p):
        pred = model_apply(p, noisy)
        return smape(jnp.log1p(jnp.maximum(pred, 0.0)), jnp.log1p(jnp.maximum(clean, 0.0)))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def denoise_image(model, params, hdr_hwc):
    """Denoise one (H, W, 3) HDR image (e.g. Renderer.fbo_data())."""
    x = jnp.asarray(hdr_hwc, jnp.float32).transpose(2, 0, 1)[None]
    out = model.apply(params, x)
    return jnp.asarray(out[0]).transpose(1, 2, 0)


def save_params(path, params):
    import pickle

    with open(path, "wb") as f:
        pickle.dump(jax.device_get(params), f)


def load_params(path):
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)
