"""Optional pretrained-BERT text head.

Capability parity with the reference's ``BertTextualHead``
(modules/mage_model.py:125-178): a pretrained BERT encoder whose final
hidden states are projected to the MA-encoder width by a learned matrix
(``text_projection_key``, :152). No shipped reference config uses it (all
use TransformerTextEncoder — SURVEY.md §2.2), and it requires local
pretrained weights (zero-egress environments cannot download), so the
import is deferred and gated.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp


class BertTextualHead:
    """Wraps HF FlaxBertModel + a projection. Usage:

        head = BertTextualHead(bert_path, out_dim)
        params = head.init(rng)                  # projection only
        emb = head.apply(params, token_ids)      # (B, S, out_dim)
    """

    def __init__(self, bert_path: str, out_dim: int):
        from transformers import FlaxBertModel

        self.model = FlaxBertModel.from_pretrained(bert_path)
        self.hidden_size = self.model.config.hidden_size
        self.out_dim = out_dim
        self.padding_idx = self.model.config.pad_token_id

    def init(self, rng: jax.Array) -> Mapping[str, Any]:
        scale = self.hidden_size**-0.5
        return {
            "text_projection_key": scale
            * jax.random.normal(rng, (self.hidden_size, self.out_dim))
        }

    def apply(self, params: Mapping[str, Any], caption_tokens: jax.Array) -> jax.Array:
        hidden = self.model(jnp.asarray(caption_tokens)).last_hidden_state
        return hidden @ params["text_projection_key"]
