"""Layout analysis model: DonutSwin encoder + ADETR box decoder, in JAX.

Re-design of the reference layout stack (surya/layout/model/decoder.py:15-125,
encoderdecoder.py:66-123) with the ENTIRE autoregressive loop inside one
jitted program: the reference steps the decoder from Python and syncs logits
to CPU every box (surya/layout/__init__.py:111-184); here a lax.while_loop
emits up to LAYOUT_MAX_BOXES boxes on device, including the
header/footer-position rewrite rule (:162-174), which reduces to pure
token-space arithmetic because the polygon scale factors cancel against the
page-size thresholds.

Reading order falls out of emission order (the `position` field downstream).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from surya_tpu import nn
from surya_tpu.models import adetr, donut_swin

SPECIAL_TOKENS = 3
ID_TO_LABEL = {
    0: "Blank",
    1: "Text",
    2: "TextInlineMath",
    3: "Code",
    4: "SectionHeader",
    5: "Caption",
    6: "Footnote",
    7: "Equation",
    8: "ListItem",
    9: "PageFooter",
    10: "PageHeader",
    11: "Picture",
    12: "Figure",
    13: "Table",
    14: "Form",
    15: "TableOfContents",
    16: "Handwriting",
}
LABEL_TO_ID = {v: k for k, v in ID_TO_LABEL.items()}
# shifted class ids of PageFooter/PageHeader for the position rule
_HF_CLASS_IDS = (LABEL_TO_ID["PageFooter"] + SPECIAL_TOKENS, LABEL_TO_ID["PageHeader"] + SPECIAL_TOKENS)


@dataclass(frozen=True)
class LayoutConfig:
    vocab_size: int = 1025  # bbox coordinate vocabulary (0..1024)
    bbox_size: int = 1024
    skew_scaler: int = 512
    label_count: int = len(ID_TO_LABEL) + SPECIAL_TOKENS
    special_token_count: int = SPECIAL_TOKENS
    pad_token_id: int = 0
    eos_token_id: int = 1
    bos_token_id: int = 1
    pause_token_id: int = 2
    max_boxes: int = 100
    layer_norm_eps: float = 1e-5
    encoder: donut_swin.DonutSwinConfig = field(default_factory=donut_swin.DonutSwinConfig)
    decoder: adetr.ADETRConfig = field(default_factory=adetr.ADETRConfig)


_BOX_FIELDS = ("cx", "cy", "w", "h", "xskew", "yskew")
_CORNER_FIELDS = ("x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4")


def init_params(config: LayoutConfig, key, dtype=jnp.float32):
    ks = nn.key_iter(key)
    h = config.decoder.hidden_size
    embed = {
        f"{f}_embed": nn.embedding_init(next(ks), config.vocab_size, h, dtype=dtype)
        for f in _BOX_FIELDS + _CORNER_FIELDS
    }
    embed["label_embed"] = nn.embedding_init(next(ks), config.label_count, h, dtype=dtype)
    return {
        "encoder": donut_swin.init_params(config.encoder, next(ks), dtype),
        "decoder": adetr.init_params(config.decoder, next(ks), dtype),
        "embedder": embed,
        "pre_output_norm": nn.layernorm_init(h, dtype),
        "lm_head": nn.linear_init(next(ks), h, config.label_count, bias=False, dtype=dtype),
        "bbox_head": nn.linear_init(next(ks), h, 6, dtype=dtype),
    }


def embed_boxes(params, config: LayoutConfig, boxes: jnp.ndarray) -> jnp.ndarray:
    """7-field box token → summed embeddings incl. 8 derived corners
    (reference BboxEmbedding: layout/model/decoder.py:15-60)."""
    e = params["embedder"]
    boxes = boxes.astype(jnp.int32)
    cx, cy, w, h, xskew, yskew, label = [boxes[..., i] for i in range(7)]

    xs = jnp.trunc((xskew - config.bbox_size // 2) / 2).astype(jnp.int32)
    ys = jnp.trunc((yskew - config.bbox_size // 2) / 2).astype(jnp.int32)
    clamp = lambda v: jnp.clip(v, 0, config.bbox_size)
    corners = {
        "x1": clamp(cx - w // 2 - xs),
        "y1": clamp(cy - h // 2 - ys),
        "x2": clamp(cx + w // 2 - xs),
        "y2": clamp(cy + h // 2 + ys),
        "x3": clamp(cx + w // 2 + xs),
        "y3": clamp(cy + h // 2 + ys),
        "x4": clamp(cx - w // 2 + xs),
        "y4": clamp(cy - h // 2 - ys),
    }
    out = nn.embedding(e["label_embed"], label)
    for f, v in zip(_BOX_FIELDS, (cx, cy, w, h, xskew, yskew)):
        out = out + nn.embedding(e[f"{f}_embed"], v)
    for f, v in corners.items():
        out = out + nn.embedding(e[f"{f}_embed"], v)
    return out


def _heads(params, config: LayoutConfig, hidden):
    h = nn.layernorm(params["pre_output_norm"], hidden, eps=config.layer_norm_eps)
    class_logits = nn.linear(params["lm_head"], h).astype(jnp.float32)
    bbox = jax.nn.sigmoid(nn.linear(params["bbox_head"], h).astype(jnp.float32))
    return class_logits, bbox


def _position_rule(config: LayoutConfig, box_f: jnp.ndarray, class_pred: jnp.ndarray) -> jnp.ndarray:
    """True where the PageHeader/PageFooter rewrite applies: the box is not
    confined to a page margin (reference surya/layout/__init__.py:162-174,
    thresholds in 0..bbox_size token space since page scaling cancels)."""
    cx, cy, w, h, xskew, yskew = [box_f[:, i] for i in range(6)]
    skew_x = jnp.floor((xskew - config.skew_scaler) / 2)
    skew_y = jnp.floor((yskew - config.skew_scaler) / 2)
    skew_x = jnp.where(jnp.abs(skew_x) < 0.001, 0.0, skew_x)
    skew_y = jnp.where(jnp.abs(skew_y) < 0.001, 0.0, skew_y)
    x0 = cx - w / 2 - skew_x
    y0 = cy - h / 2 - skew_y
    x2 = cx + w / 2 + skew_x
    y2 = cy + h / 2 + skew_y

    is_hf = (class_pred == _HF_CLASS_IDS[0]) | (class_pred == _HF_CLASS_IDS[1])
    lo = 0.2 * config.bbox_size
    hi = 0.8 * config.bbox_size
    return is_hf & (y0 < hi) & (y2 > lo) & (x0 < hi) & (x2 > lo)


def generate(params, config: LayoutConfig, pixel_values: jnp.ndarray):
    """Full layout inference for a batch of normalized 768x768 pages.

    Returns (boxes [B, MAX, 7] float32 — 6 box values in 0..bbox_size + final
    class id, class_logits [B, MAX, label_count] float32 (post-rewrite), and
    valid [B, MAX] bool — emission recorded iff the row wasn't done).
    """
    B = pixel_values.shape[0]
    MAX = config.max_boxes

    enc = donut_swin.apply(params["encoder"], config.encoder, pixel_values)
    cross_k, cross_v = adetr.precompute_cross_kv(params["decoder"], config.decoder, enc)
    cache = adetr.init_cache(config.decoder, B, MAX + 1, enc.dtype)

    start_box = jnp.full((B, 7), config.bos_token_id, jnp.int32)
    boxes_buf = jnp.zeros((B, MAX, 7), jnp.float32)
    logits_buf = jnp.zeros((B, MAX, config.label_count), jnp.float32)
    valid_buf = jnp.zeros((B, MAX), bool)
    done = jnp.zeros((B,), bool)

    def cond(state):
        i, _, _, done, *_ = state
        return (i < MAX) & ~jnp.all(done)

    def body(state):
        i, cache, last_box, done, boxes_buf, logits_buf, valid_buf = state
        emb = embed_boxes(params, config, last_box)
        cache, hidden = adetr.step(
            params["decoder"], config.decoder, cache, cross_k, cross_v, emb,
            jnp.full((B,), i, jnp.int32),
        )
        class_logits, bbox = _heads(params, config, hidden)
        box_f = bbox * config.bbox_size  # float box values (recorded as-is)
        class_pred = jnp.argmax(class_logits, axis=-1).astype(jnp.int32)

        newly_done = (class_pred == config.eos_token_id) | (class_pred == config.pad_token_id)
        done_after = done | newly_done

        rule = _position_rule(config, box_f, class_pred)
        onehot = jax.nn.one_hot(class_pred, config.label_count, dtype=bool)
        new_logits = jnp.where(rule[:, None] & onehot, 0.0, class_logits)
        class_final = jnp.where(rule, jnp.argmax(new_logits, axis=-1).astype(jnp.int32), class_pred)

        record = ~done_after
        token = jnp.concatenate([box_f, class_final[:, None].astype(jnp.float32)], axis=-1)
        boxes_buf = boxes_buf.at[:, i].set(jnp.where(record[:, None], token, 0.0))
        logits_buf = logits_buf.at[:, i].set(jnp.where(record[:, None], new_logits, 0.0))
        valid_buf = valid_buf.at[:, i].set(record)

        next_box = jnp.concatenate(
            [box_f.astype(jnp.int32), class_final[:, None]], axis=-1
        )
        return i + 1, cache, next_box, done_after, boxes_buf, logits_buf, valid_buf

    state = (0, cache, start_box, done, boxes_buf, logits_buf, valid_buf)
    _, _, _, _, boxes_buf, logits_buf, valid_buf = jax.lax.while_loop(cond, body, state)
    return boxes_buf, logits_buf, valid_buf


# -- checkpoint conversion ----------------------------------------------------

def convert_torch(tensors, config: LayoutConfig, dtype=jnp.float32):
    from surya_tpu.common.weights import TensorBag

    bag = tensors if isinstance(tensors, TensorBag) else TensorBag(tensors, dtype)
    embed = {
        f"{f}_embed": bag.embedding(f"decoder.model.embed_tokens.{f}_embed")
        for f in _BOX_FIELDS + _CORNER_FIELDS
    }
    embed["label_embed"] = bag.embedding("decoder.model.embed_tokens.label_embed")
    params = {
        "encoder": donut_swin.convert_torch(bag, config.encoder, "encoder"),
        "decoder": adetr.convert_torch(bag, config.decoder, "decoder.model"),
        "embedder": embed,
        "pre_output_norm": bag.layernorm("decoder.pre_output_norm"),
        "lm_head": bag.linear("decoder.lm_head", bias=False),
        "bbox_head": bag.linear("decoder.bbox_head"),
    }
    bag.warn_unused("layout")
    return params
