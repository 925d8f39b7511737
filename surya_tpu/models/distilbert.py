"""DistilBERT sequence classifier for OCR error detection, in JAX.

Re-design of the vendored reference encoder
(surya/ocr_error/model/encoder.py:48-697): word + learned position
embeddings with LayerNorm (eps 1e-12), 6 post-norm transformer blocks
(MHA + GELU FFN), and the classification head (CLS token → pre_classifier →
ReLU → classifier) from DistilBertForSequenceClassification.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from surya_tpu import nn
from surya_tpu.ops import attention as att

ID2LABEL = {0: "good", 1: "bad"}


@dataclass(frozen=True)
class DistilBertConfig:
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    n_layers: int = 6
    n_heads: int = 12
    dim: int = 768
    hidden_dim: int = 3072
    num_labels: int = 2
    layer_norm_eps: float = 1e-12


def init_params(config: DistilBertConfig, key, dtype=jnp.float32):
    ks = nn.key_iter(key)
    layers = []
    for _ in range(config.n_layers):
        layers.append(
            {
                "q_lin": nn.linear_init(next(ks), config.dim, config.dim, dtype=dtype),
                "k_lin": nn.linear_init(next(ks), config.dim, config.dim, dtype=dtype),
                "v_lin": nn.linear_init(next(ks), config.dim, config.dim, dtype=dtype),
                "out_lin": nn.linear_init(next(ks), config.dim, config.dim, dtype=dtype),
                "sa_layer_norm": nn.layernorm_init(config.dim, dtype),
                "lin1": nn.linear_init(next(ks), config.dim, config.hidden_dim, dtype=dtype),
                "lin2": nn.linear_init(next(ks), config.hidden_dim, config.dim, dtype=dtype),
                "output_layer_norm": nn.layernorm_init(config.dim, dtype),
            }
        )
    return {
        "word_embeddings": nn.embedding_init(next(ks), config.vocab_size, config.dim, dtype=dtype),
        "position_embeddings": nn.embedding_init(next(ks), config.max_position_embeddings, config.dim, dtype=dtype),
        "embed_layer_norm": nn.layernorm_init(config.dim, dtype),
        "layers": layers,
        "pre_classifier": nn.linear_init(next(ks), config.dim, config.dim, dtype=dtype),
        "classifier": nn.linear_init(next(ks), config.dim, config.num_labels, dtype=dtype),
    }


def apply(params, config: DistilBertConfig, input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """input_ids [B, S] int32, attention_mask [B, S] (1 = attend).
    Returns classification logits [B, num_labels]."""
    B, S = input_ids.shape
    eps = config.layer_norm_eps
    x = nn.embedding(params["word_embeddings"], input_ids)
    x = x + nn.embedding(params["position_embeddings"], jnp.arange(S))[None]
    x = nn.layernorm(params["embed_layer_norm"], x, eps=eps)

    bias = att.mask_to_bias(attention_mask[:, None, None, :].astype(bool))
    head_dim = config.dim // config.n_heads
    for layer in params["layers"]:
        q = nn.linear(layer["q_lin"], x).reshape(B, S, config.n_heads, head_dim)
        k = nn.linear(layer["k_lin"], x).reshape(B, S, config.n_heads, head_dim)
        v = nn.linear(layer["v_lin"], x).reshape(B, S, config.n_heads, head_dim)
        out = att.sdpa(q, k, v, bias=bias).reshape(B, S, config.dim)
        x = nn.layernorm(layer["sa_layer_norm"], x + nn.linear(layer["out_lin"], out), eps=eps)
        h = nn.linear(layer["lin2"], jax.nn.gelu(nn.linear(layer["lin1"], x), approximate=False))
        x = nn.layernorm(layer["output_layer_norm"], x + h, eps=eps)

    cls = x[:, 0]
    h = jax.nn.relu(nn.linear(params["pre_classifier"], cls))
    return nn.linear(params["classifier"], h).astype(jnp.float32)


def convert_torch(tensors, config: DistilBertConfig, dtype=jnp.float32):
    from surya_tpu.common.weights import TensorBag

    bag = tensors if isinstance(tensors, TensorBag) else TensorBag(tensors, dtype)
    layers = []
    for i in range(config.n_layers):
        b = f"distilbert.transformer.layer.{i}"
        layers.append(
            {
                "q_lin": bag.linear(f"{b}.attention.q_lin"),
                "k_lin": bag.linear(f"{b}.attention.k_lin"),
                "v_lin": bag.linear(f"{b}.attention.v_lin"),
                "out_lin": bag.linear(f"{b}.attention.out_lin"),
                "sa_layer_norm": bag.layernorm(f"{b}.sa_layer_norm"),
                "lin1": bag.linear(f"{b}.ffn.lin1"),
                "lin2": bag.linear(f"{b}.ffn.lin2"),
                "output_layer_norm": bag.layernorm(f"{b}.output_layer_norm"),
            }
        )
    params = {
        "word_embeddings": bag.embedding("distilbert.embeddings.word_embeddings"),
        "position_embeddings": bag.embedding("distilbert.embeddings.position_embeddings"),
        "embed_layer_norm": bag.layernorm("distilbert.embeddings.LayerNorm"),
        "layers": layers,
        "pre_classifier": bag.linear("pre_classifier"),
        "classifier": bag.linear("classifier"),
    }
    bag.warn_unused("ocr_error")
    return params
