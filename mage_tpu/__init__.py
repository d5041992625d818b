"""MAGE-TPU: a TPU-native text-and-image-to-video (TI2V) generation framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the MAGE /
MAGE+ system (CVPR'22 "Make It Move", reference: Youncy-Hu/MAGE):

- Stage 1: frame autoencoders — a VQ-VAE with a Pallas nearest-neighbor
  quantization kernel (reference: modules/vqvae_model.py) and a KL
  autoencoder for MAGE+ (reference delegates to the external `ldm` package).
- Stage 2: a video-generation transformer — transformer text encoder,
  cross-attention motion-anchor encoder, causal axial spatio-temporal
  decoder with speed conditioning and an optional stochastic "randomness"
  branch (reference: modules/mage_model.py).
- Cached autoregressive sampling via `lax.scan` (the reference re-runs the
  full decoder per frame: main_mage.py:233-248, mage_model.py:641-693).
- Data-parallel training over a `jax.sharding.Mesh` with XLA collectives
  (replacing the reference's DDP/NCCL: main_mage.py:83-106).
"""

__version__ = "0.1.0"
