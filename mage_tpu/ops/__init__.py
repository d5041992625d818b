from mage_tpu.ops.vq import (
    nearest_codebook_indices,
    vq_straight_through,
    codebook_lookup,
)
