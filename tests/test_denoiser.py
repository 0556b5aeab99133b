import numpy as np
import jax
import jax.numpy as jnp

from volren_tpu.models.denoiser import (
    Denoiser,
    create_train_state,
    denoise_image,
    train_step,
)


def test_denoiser_forward_shape_and_range():
    model, params, _, _ = create_train_state(jax.random.PRNGKey(0), patch=32, features=(8, 12, 16))
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))) * 5
    out = model.apply(params, x)
    assert out.shape == (2, 3, 32, 32)
    assert bool((np.asarray(out) >= 0).all())  # HDR output stays nonnegative


def test_denoiser_training_reduces_loss():
    rng = np.random.default_rng(0)
    clean = np.zeros((4, 3, 32, 32), np.float32)
    clean[:, :, 8:24, 8:24] = 2.0  # box signal
    noisy = clean + rng.normal(0, 0.6, clean.shape).astype(np.float32)
    noisy = np.maximum(noisy, 0)
    model, params, tx, opt_state = create_train_state(
        jax.random.PRNGKey(0), lr=3e-3, patch=32, features=(8, 12, 16)
    )
    losses = []
    for _ in range(30):
        params, opt_state, loss = train_step(
            model.apply, tx, params, opt_state, jnp.asarray(noisy), jnp.asarray(clean)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_denoise_image_helper():
    model, params, _, _ = create_train_state(jax.random.PRNGKey(0), patch=32, features=(8, 12, 16))
    img = np.abs(np.random.default_rng(2).normal(size=(32, 32, 3))).astype(np.float32)
    out = denoise_image(model, params, img)
    assert out.shape == (32, 32, 3)
