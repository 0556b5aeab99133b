"""Neural models built on the framework's data pipelines.

The reference generates denoising datasets (scripts/datagen_denoise.py)
for external consumers; here the consumer ships too: a compact UNet
denoiser trained on those noisy/converged HDF5 pairs, jitted end-to-end on
TPU (bf16 matmul path on the MXU).
"""

from .denoiser import Denoiser, create_train_state, train_step, denoise_image

__all__ = ["Denoiser", "create_train_state", "train_step", "denoise_image"]
