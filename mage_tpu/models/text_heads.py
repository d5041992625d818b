"""Pretrained-BERT text head (flax module, config-reachable).

Capability parity with the reference's ``BertTextualHead``
(modules/mage_model.py:125-178): a BERT encoder whose final hidden states
are projected to the MA-encoder width by a learned ``text_projection_key``
matrix (:152,176). Differences from the reference, by design:

- It is a real flax module, so the BERT weights live inside the MAGECore
  parameter tree and train with everything else (the reference trains the
  whole BERT too, :141).
- ``bert_path`` loads a local pretrained config (+ optionally weights via
  :func:`load_pretrained_bert_params`); ``bert_config`` builds an
  offline/random BERT from explicit hyperparameters — zero-egress
  environments cannot download ``bert-base-uncased``.

Selected from YAML via ``text_encoder_config.target:
modules.mage_model.BertTextualHead`` (alias) or
``mage_tpu.models.text_heads.BertTextualHead``.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class BertTextualHead(nn.Module):
    """BERT encoder + linear projection to ``out_dim``.

    ``__call__(text, train)`` -> (B, S, out_dim), the same contract as
    :class:`mage_tpu.models.layers.TransformerTextEncoder`.
    """

    out_dim: int
    bert_path: Optional[str] = None
    bert_config: Optional[Mapping[str, Any]] = None

    def setup(self):
        from transformers import BertConfig
        from transformers.models.bert.modeling_flax_bert import FlaxBertModule

        if self.bert_path:
            config = BertConfig.from_pretrained(self.bert_path)
        else:
            config = BertConfig(**dict(self.bert_config or {}))
        self.config = config
        self.padding_idx = config.pad_token_id
        self.bert = FlaxBertModule(config=config, name="bert")
        scale = config.hidden_size**-0.5
        self.text_projection_key = self.param(
            "text_projection_key",
            lambda rng: scale * jax.random.normal(rng, (config.hidden_size, self.out_dim)),
        )

    def __call__(self, text: jax.Array, train: bool = True) -> jax.Array:
        text = text.astype(jnp.int32)
        attention_mask = (text != self.padding_idx).astype(jnp.int32)
        out = self.bert(text, attention_mask, deterministic=not train)
        return out.last_hidden_state @ self.text_projection_key


def load_pretrained_bert_params(bert_path: str) -> Mapping[str, Any]:
    """Load local pretrained BERT weights as a flax param tree suitable for
    grafting under ``params['text_encoder']['bert']``. Accepts either a
    flax checkpoint or a torch one (``pytorch_model.bin`` / torch
    safetensors) — the reference downloads the torch ``bert-base-uncased``
    from the hub (modules/mage_model.py:136-139), so a user migrating from
    it will typically have torch weights on disk."""
    from transformers import FlaxBertModel

    try:
        model = FlaxBertModel.from_pretrained(bert_path)
    except (OSError, EnvironmentError):
        model = FlaxBertModel.from_pretrained(bert_path, from_pt=True)
    return model.params
