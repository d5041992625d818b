"""Stage-1 frame autoencoder: VQ-VAE with a Pallas quantization kernel.

Capability parity with the reference's ``VectorQuantizedVAE``
(reference: modules/vqvae_model.py:87-248):

- ``down_ratio=4`` (MNIST 64->16): two stride-2 convs + 2 ResBlocks;
  mirrored transposed-conv decoder with Tanh (:171-190).
- ``down_ratio=8`` (CATER 128->16): 7x7 stem, 4 bottleneck EncoderBlocks
  with 3 MaxPools, codebook dim ``4*dim``; nearest-upsample decoder
  (:191-215).
- Codebook: (K, D) embedding, init U(-1/K, 1/K) (:87-91); straight-through
  quantization with attached-codebook ``z_q_bar`` branch (:98-108).

TPU-native design notes (not a port):

- NHWC layout end to end (XLA's native conv layout on TPU).
- The nearest-neighbor lookup is the fused Pallas kernel in
  ``mage_tpu.ops.vq`` (MXU distances + VPU argmin), not two hand-written
  autograd Functions.
- BatchNorm statistics are *global* across the data-parallel mesh because
  the jitted loss sees the whole logically-global batch (the reference's
  DDP BatchNorm is per-rank and unsynced — a conscious improvement,
  SURVEY.md §7 hard-part 3). Running averages are kept for the frozen
  first-stage use in MAGE (mage_model.py:516-521 sets eval());
  ``momentum=0.9`` matches torch's default update rate so short trainings
  calibrate the eval-mode statistics at the same speed as the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mage_tpu.ops import codebook_lookup, nearest_codebook_indices, vq_straight_through

_conv_init = nn.initializers.xavier_uniform()


class ResBlock(nn.Module):
    """ReLU -> 3x3 conv -> BN -> ReLU -> 1x1 conv -> BN, residual
    (reference vqvae_model.py:111-124).

    The residual branch is ``relu(x)``, not ``x``: the reference's
    ``block`` starts with ``nn.ReLU(inplace=True)``, which mutates the
    tensor that ``x + self.block(x)`` then adds (vqvae_model.py:115,123) —
    verified numerically in tests/test_reference_parity.py."""

    dim: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        xr = nn.relu(x)
        h = nn.Conv(self.dim, (3, 3), padding=1, kernel_init=_conv_init)(xr)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (1, 1), kernel_init=_conv_init)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        return xr + h


class EncoderBlock(nn.Module):
    """Bottleneck residual (hid = out/4), 3x (3x3) + 1x1, with a 1x1
    id-path when channel count changes (reference vqvae_model.py:126-145)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        dim_hid = self.dim_out // 4
        idp = x
        if x.shape[-1] != self.dim_out:
            idp = nn.Conv(self.dim_out, (1, 1), kernel_init=_conv_init)(x)
        h = nn.relu(x)
        h = nn.Conv(dim_hid, (3, 3), padding=1, kernel_init=_conv_init)(h)
        h = nn.relu(h)
        h = nn.Conv(dim_hid, (3, 3), padding=1, kernel_init=_conv_init)(h)
        h = nn.relu(h)
        h = nn.Conv(dim_hid, (3, 3), padding=1, kernel_init=_conv_init)(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim_out, (1, 1), kernel_init=_conv_init)(h)
        return idp + h


class DecoderBlock(nn.Module):
    """Bottleneck residual, 1x1 + 2x (3x3) + 3x3
    (reference vqvae_model.py:147-166).

    ``upsample=True`` fuses a preceding 2x nearest-neighbor upsample into
    the block: relu and the two 1x1 convs (bottleneck entry + identity
    path) are pointwise, so they commute exactly with nearest upsampling —
    computing them at LOW resolution then upsampling is bitwise-identical
    arithmetic per output pixel at 1/4 the FLOPs, and the materialized
    upsampled tensor shrinks from dim_out to dim_out/4 channels (the
    decode step's dominant HBM traffic). Parameter names/shapes are
    unchanged, so checkpoints are interchangeable with the naive order."""

    dim_out: int
    upsample: bool = False

    @nn.compact
    def __call__(self, x):
        dim_hid = self.dim_out // 4
        idp = x
        if x.shape[-1] != self.dim_out:
            idp = nn.Conv(self.dim_out, (1, 1), kernel_init=_conv_init)(x)
        h = nn.relu(x)
        h = nn.Conv(dim_hid, (1, 1), kernel_init=_conv_init)(h)
        if self.upsample:
            h = _upsample_nearest(h)
            idp = _upsample_nearest(idp)
        h = nn.relu(h)
        h = nn.Conv(dim_hid, (3, 3), padding=1, kernel_init=_conv_init)(h)
        h = nn.relu(h)
        h = nn.Conv(dim_hid, (3, 3), padding=1, kernel_init=_conv_init)(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, kernel_init=_conv_init)(h)
        return idp + h


def _upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class _Encoder4(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.dim, (4, 4), strides=2, padding=1, kernel_init=_conv_init)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Conv(self.dim, (4, 4), strides=2, padding=1, kernel_init=_conv_init)(x)
        x = ResBlock(self.dim)(x, train)
        x = ResBlock(self.dim)(x, train)
        return x


class _Decoder4(nn.Module):
    dim: int
    out_dim: int

    @nn.compact
    def __call__(self, z, train: bool = True):
        z = ResBlock(self.dim)(z, train)
        z = ResBlock(self.dim)(z, train)
        z = nn.relu(z)
        # transpose_kernel + explicit padding matches torch
        # ConvTranspose2d(k=4, s=2, p=1) exactly (for weight import)
        z = nn.ConvTranspose(
            self.dim, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            transpose_kernel=True, kernel_init=_conv_init,
        )(z)
        z = nn.BatchNorm(use_running_average=not train, momentum=0.9)(z)
        z = nn.relu(z)
        z = nn.ConvTranspose(
            self.out_dim, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            transpose_kernel=True, kernel_init=_conv_init,
        )(z)
        return nn.tanh(z)


class _Encoder8(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.dim, (7, 7), padding=3, kernel_init=_conv_init)(x)
        x = EncoderBlock(self.dim)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = EncoderBlock(self.dim)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = EncoderBlock(2 * self.dim)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = EncoderBlock(4 * self.dim)(x)
        return nn.relu(x)


class _Decoder8(nn.Module):
    dim: int
    out_dim: int

    @nn.compact
    def __call__(self, z, train: bool = True):
        z = DecoderBlock(2 * self.dim)(z)
        z = DecoderBlock(self.dim, upsample=True)(z)
        z = DecoderBlock(self.dim, upsample=True)(z)
        z = DecoderBlock(self.dim, upsample=True)(z)
        z = nn.relu(z)
        z = nn.Conv(self.out_dim, (1, 1), kernel_init=_conv_init)(z)
        return nn.tanh(z)


class VectorQuantizedVAE(nn.Module):
    """Two architectures switched on ``down_ratio`` (4: MNIST, 8: CATER).

    ``__call__(x)`` -> ``(x_tilde, z_e, z_q_bar)`` matching the reference
    forward contract (vqvae_model.py:244-248): ``x_tilde`` decodes the
    straight-through codes; ``z_q_bar`` re-selects with the *attached*
    codebook so the VQ loss trains the codebook (:98-108).
    """

    input_dim: int = 1
    down_ratio: int = 4
    dim: int = 256
    K: int = 512
    ckpt_path: Optional[str] = None
    ignore_keys: Sequence[str] = ()
    vq_impl: str = "auto"

    @property
    def embed_dim(self) -> int:
        return self.dim if self.down_ratio == 4 else 4 * self.dim

    def setup(self):
        if self.down_ratio == 4:
            self.encoder = _Encoder4(self.dim)
            self.decoder = _Decoder4(self.dim, self.input_dim)
        elif self.down_ratio == 8:
            self.encoder = _Encoder8(self.dim)
            self.decoder = _Decoder8(self.dim, self.input_dim)
        else:
            raise ValueError(f"unsupported down_ratio {self.down_ratio}")
        k = self.K
        self.codebook = self.param(
            "codebook",
            lambda rng: jax.random.uniform(
                rng, (k, self.embed_dim), jnp.float32, -1.0 / k, 1.0 / k
            ),
        )

    def encode(self, x: jax.Array, train: bool = False) -> jax.Array:
        """(B, H, W, C) frames -> (B, h, w) int32 codebook ids
        (reference vqvae_model.py:233-237)."""
        z_e = self.encoder(x, train)
        return nearest_codebook_indices(z_e, self.codebook, impl=self.vq_impl)

    def decode(self, ids: jax.Array, train: bool = False) -> jax.Array:
        """(B, h, w) ids -> (B, H, W, C) frames in [-1, 1]
        (reference vqvae_model.py:239-242)."""
        z_q = codebook_lookup(self.codebook, ids)
        return self.decoder(z_q, train)

    def __call__(self, x: jax.Array, train: bool = True):
        z_e = self.encoder(x, train)
        # Straight-through: decoder grads flow unchanged into z_e, none into
        # the codebook (the reference passes codebook.detach():
        # vqvae_model.py:100) — both built into vq_straight_through's vjp.
        codes, ids = vq_straight_through(
            z_e, jax.lax.stop_gradient(self.codebook), self.vq_impl
        )
        x_tilde = self.decoder(codes, train)
        z_q_bar = codebook_lookup(self.codebook, ids)  # attached branch
        return x_tilde, z_e, z_q_bar
