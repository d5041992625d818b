from mage_tpu.models.vqvae import VectorQuantizedVAE
