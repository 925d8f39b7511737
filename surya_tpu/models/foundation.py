"""The recognition foundation model: ViT encoder + AR decoder + dual heads.

TPU-native re-design of the reference SuryaModel
(surya/common/surya/__init__.py:57-338). One jitted program performs the
whole prefill — vision encoding, <IMAGE>-scatter, 2-D learned position
embeddings, decoder prefill, KV scatter into the slot cache, and greedy
sampling — so a prefill costs exactly one host→device round trip. Decoding
runs as an on-device lax.while_loop emitting K tokens per host visit
(the reference syncs logits to CPU EVERY token:
surya/recognition/__init__.py:545-595 — the #1 cost eliminated here).

Weight tying: lm_head shares the token embedding matrix (reference
_tie_weights :113-116); we compute logits against the embedding table instead
of materializing a second [vocab, hidden] array.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from surya_tpu import nn
from surya_tpu.models import qwen_decoder, qwen_encoder


@dataclass(frozen=True)
class FoundationConfig:
    vocab_size: int = 65536
    bbox_size: int = 1025
    bos_token_id: int = 0
    eos_token_id: int = 1
    pad_token_id: int = 2
    image_token_id: int = 3
    max_sequence_length: int = 1536
    num_register_tokens: int = 4
    image_embed_encoding_size: int = 1024
    image_embed_encoding_multiplier: int = 256
    encoder: qwen_encoder.EncoderConfig = field(default_factory=qwen_encoder.EncoderConfig)
    decoder: qwen_decoder.DecoderConfig = field(default_factory=qwen_decoder.DecoderConfig)

    @property
    def hidden_size(self) -> int:
        return self.decoder.hidden_size


def init_params(config: FoundationConfig, key, dtype=jnp.float32):
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    h = config.hidden_size
    return {
        "vision_encoder": qwen_encoder.init_params(config.encoder, k1, dtype),
        "decoder": qwen_decoder.init_params(config.decoder, k2, dtype),
        "token_embed": nn.embedding_init(k3, config.vocab_size, h, dtype=dtype),
        "img_w_embed": nn.embedding_init(k4, config.image_embed_encoding_size, h, dtype=dtype),
        "img_h_embed": nn.embedding_init(k5, config.image_embed_encoding_size, h, dtype=dtype),
        "bbox_head": nn.linear_init(k6, h, 6, dtype=dtype),
        "lm_head_bias": jnp.zeros((config.vocab_size,), dtype),
        # vision projection happens inside the encoder's merger; out_hidden
        # must equal decoder hidden for the scatter to type-check
    }


def _sample_greedy(params, config: FoundationConfig, hidden: jnp.ndarray):
    """Greedy token + confidence + bbox from last-token hidden states [B, h].
    Mirrors process_outputs (surya/recognition/__init__.py:294-324)."""
    emb = params["token_embed"]["embedding"]
    logits = (hidden @ emb.T + params["lm_head_bias"]).astype(jnp.float32)
    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    probs = jax.nn.softmax(logits, axis=-1)
    score = jnp.max(probs, axis=-1)
    bbox = jax.nn.sigmoid(nn.linear(params["bbox_head"], hidden).astype(jnp.float32))
    bbox_int = (bbox * config.bbox_size).astype(jnp.int32)
    return token, score, bbox_int


def embed_prompt_tokens(params, config: FoundationConfig, input_ids, img_gather, image_tokens):
    """Token embeddings with image embeddings scattered into <IMAGE> slots.
    img_gather: [B, L] index into image_tokens rows, -1 for text positions
    (host-computed — replaces the reference's masked_scatter
    surya/common/surya/__init__.py:214-224)."""
    tok = nn.embedding(params["token_embed"], input_ids)
    img = jnp.take(image_tokens, jnp.maximum(img_gather, 0), axis=0)
    return jnp.where((img_gather >= 0)[..., None], img.astype(tok.dtype), tok)


def encode_images(params, config: FoundationConfig, patches, enc_args, llm_h_idx, llm_w_idx, kv_range: int, win_range: int, mesh=None):
    """Vision encoder + 2-D learned position embeddings → image tokens
    [llm_cap, hidden] in original order. enc_args: EncoderLayout.device_args."""
    img_tokens = qwen_encoder.apply(
        params["vision_encoder"], config.encoder, patches, *enc_args,
        kv_range=kv_range, win_range=win_range, mesh=mesh,
    )
    enc2d = nn.embedding(params["img_h_embed"], llm_h_idx) + nn.embedding(params["img_w_embed"], llm_w_idx)
    return img_tokens + enc2d


def _sharded_encode_embed(
    params, config: FoundationConfig, patches, enc_args, llm_h_idx, llm_w_idx,
    input_ids, img_gather, kv_range: int, win_range: int, mesh,
):
    """Data-sharded encoder prefill: patches/layout arrays carry a leading
    [n_shards] axis (one packed plan per data shard, processor
    build_prefill_batch n_shards>1) and prompt rows occupy group-contiguous
    blocks, so each shard encodes ONLY its own rows' images and the <IMAGE>
    gather is shard-local — no collectives, and encoder FLOPs scale with the
    data axis instead of replicating. Returns embeds [B, L, hidden] sharded
    over rows."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from surya_tpu.parallel import mesh as meshlib

    d = P(meshlib.DATA_AXIS)
    sub = {
        "vision_encoder": params["vision_encoder"],
        "img_h_embed": params["img_h_embed"],
        "img_w_embed": params["img_w_embed"],
        "token_embed": params["token_embed"],
    }

    def local(sub, patches, enc_args, h_idx, w_idx, ids, gather):
        # leading shard axis is 1 inside the shard; mesh=None -> the plain
        # (non-shard_map) kernel dispatch, we're already per-device here
        img_tokens = encode_images(
            sub, config, patches[0], tuple(a[0] for a in enc_args),
            h_idx[0], w_idx[0], kv_range, win_range, mesh=None,
        )
        return embed_prompt_tokens(sub, config, ids, gather, img_tokens)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), d, tuple(d for _ in enc_args), d, d, d, d),
        out_specs=d, check_vma=False,
    )(sub, patches, enc_args, llm_h_idx, llm_w_idx, input_ids, img_gather)


def prefill(
    params,
    config: FoundationConfig,
    cache: dict,
    patches,
    enc_args,
    llm_h_idx,
    llm_w_idx,
    input_ids,
    img_gather,
    seq_lens,
    slot_idx,
    kv_range: int,
    win_range: int,
    use_pallas=None,  # None = auto; False forces jnp attention
    mesh=None,  # shard_map the kernels / data-sharded encoder (multi-chip)
):
    """Fused prefill: encode images, build the mixed embedding sequence,
    run the decoder prefill, scatter KV into cache slots, sample token 0.

    patches with a leading shard axis ([n_shards, cap, patch_dim]) select the
    data-sharded encoder path (requires mesh).
    Returns (new_cache, token [B], score [B], bbox [B, 6])."""
    if patches.ndim == 3:
        assert mesh is not None, "sharded patches need a mesh"
        embeds = _sharded_encode_embed(
            params, config, patches, enc_args, llm_h_idx, llm_w_idx,
            input_ids, img_gather, kv_range, win_range, mesh,
        )
    else:
        image_tokens = encode_images(
            params, config, patches, enc_args, llm_h_idx, llm_w_idx, kv_range, win_range, mesh=mesh
        )
        embeds = embed_prompt_tokens(params, config, input_ids, img_gather, image_tokens)
    new_k, new_v, last_hidden = qwen_decoder.prefill(
        params["decoder"], config.decoder, embeds, seq_lens, use_pallas=use_pallas, mesh=mesh
    )
    cache = qwen_decoder.merge_prefill(cache, new_k, new_v, seq_lens, slot_idx)
    token, score, bbox = _sample_greedy(params, config, last_hidden)
    return cache, token, score, bbox


def decode_chunk(
    params,
    config: FoundationConfig,
    cache: dict,
    last_token: jnp.ndarray,  # [B] int32 input token per slot
    active: jnp.ndarray,  # [B] bool — slot is generating
    num_steps: int,
    use_pallas=None,  # None = auto; False forces the jnp attention path
    mesh=None,  # shard_map the decode kernel over this mesh (multi-chip)
    run=None,  # [B] int32 consecutive-equal-token run length (device repeat stop)
    repeat_window: int = 0,  # stop a slot once run >= window (0 = disabled)
    pin_decode: bool = False,  # ignore EOS/repeat: slots decode until the host kills them
):
    """Run up to num_steps greedy decode steps entirely on device.

    A slot stops when it emits EOS/PAD (its emitted token is still recorded,
    matching the reference loop). Exits early once every slot is done.

    Device repeat stop: when ``run``/``repeat_window`` are given, a slot also
    stops once it has emitted ``repeat_window`` identical tokens in a row —
    the uniq=1 (pure collapse) case of the host chunk_stop_scan heuristic
    (recognition/util.py:90-127; reference detect_repeat_token,
    surya/recognition/__init__.py:583-595). The host scan still runs and
    catches period-2..5 repeats one dispatch later via the kill mask; firing
    the dominant case on device lets the chunk while_loop exit early instead
    of decoding tokens the host will discard. ``run`` threads through the
    scheduler's device state like last_token/active; a slot's run seeds to 1
    at prefill (token 0).

    Returns (cache, tokens [B, K], scores [B, K], bboxes [B, K, 6],
    last_token [B], active [B]) — plus run [B] when ``run`` was given.
    """
    track_run = run is not None
    run_state = run if track_run else jnp.zeros(last_token.shape, jnp.int32)
    B = last_token.shape[0]
    K = num_steps
    dec = config.decoder
    tokens_buf = jnp.full((B, K), config.pad_token_id, jnp.int32)
    scores_buf = jnp.zeros((B, K), jnp.float32)
    bbox_buf = jnp.zeros((B, K, 6), jnp.int32)

    # the big cache stays READ-ONLY inside the loop; new KV accumulates in a
    # small chunk buffer and is committed once at the end (qwen_decoder
    # .decode_step_chunked) — per-step writes to the full cache would copy it
    # every iteration of the while_loop. The chunk buffer is always COMPUTE
    # dtype: with a quantized cache, quantization happens only at commit_chunk
    # (within-chunk attention must see exact keys/values, mirroring how the
    # reference HQQ cache quantizes only on cache insertion,
    # surya/recognition/cache.py:112-186).
    compute_dtype = params["token_embed"]["embedding"].dtype
    kv_shape = (dec.num_hidden_layers, B, dec.num_key_value_heads, K, dec.head_dim)
    chunk_k = jnp.zeros(kv_shape, compute_dtype)
    chunk_v = jnp.zeros(kv_shape, compute_dtype)
    base_len = cache["len"]
    advance = jnp.zeros((B,), jnp.int32)

    def cond(state):
        step, active = state[0], state[5]
        return (step < K) & jnp.any(active)

    def body(state):
        step, chunk_k, chunk_v, advance, last_token, active, run_state, tokens_buf, scores_buf, bbox_buf = state
        emb = nn.embedding(params["token_embed"], last_token)
        chunk_k, chunk_v, hidden = qwen_decoder.decode_step_chunked(
            params["decoder"], dec, cache, chunk_k, chunk_v, emb, step, base_len,
            use_pallas=use_pallas, mesh=mesh,
        )
        token, score, bbox = _sample_greedy(params, config, hidden)

        emitted_done = (token == config.eos_token_id) | (token == config.pad_token_id)
        tokens_buf = tokens_buf.at[:, step].set(jnp.where(active, token, config.pad_token_id))
        scores_buf = scores_buf.at[:, step].set(jnp.where(active, jnp.where(emitted_done, 0.0, score), 0.0))
        bbox_buf = bbox_buf.at[:, step].set(jnp.where(active[:, None], bbox, 0))

        advance = advance + active.astype(jnp.int32)
        # pinned mode (settings.RECOGNITION_PIN_DECODE): EOS never stops a
        # slot — the host's budget scan kills it via the next dispatch's
        # kill mask, so every prompt emits exactly its token budget
        next_active = active if pin_decode else (active & ~emitted_done)
        # the stop-step token is recorded above with its score, exactly where
        # the host scan cuts, so the host-visible output is unchanged
        run_state = jnp.where(
            active, jnp.where(token == last_token, run_state + 1, 1), run_state
        )
        if repeat_window:
            next_active = next_active & (run_state < repeat_window)
        next_token = jnp.where(next_active, token, config.pad_token_id)
        return step + 1, chunk_k, chunk_v, advance, next_token, next_active, run_state, tokens_buf, scores_buf, bbox_buf

    state = (0, chunk_k, chunk_v, advance, last_token, active, run_state, tokens_buf, scores_buf, bbox_buf)
    _, chunk_k, chunk_v, advance, last_token, active, run_state, tokens_buf, scores_buf, bbox_buf = jax.lax.while_loop(cond, body, state)
    cache = qwen_decoder.commit_chunk(cache, chunk_k, chunk_v, base_len, advance)
    out = (cache, tokens_buf, scores_buf, bbox_buf, last_token, active)
    return out + ((run_state,) if track_run else ())


# -- checkpoint conversion ----------------------------------------------------

def convert_torch(tensors, config: FoundationConfig, dtype=jnp.float32):
    from surya_tpu.common.weights import TensorBag

    bag = tensors if isinstance(tensors, TensorBag) else TensorBag(tensors, dtype)
    params = {
        "vision_encoder": qwen_encoder.convert_torch(bag, config.encoder, "vision_encoder"),
        "decoder": qwen_decoder.convert_torch(bag, config.decoder, "decoder"),
        "token_embed": bag.embedding("embedder.token_embed"),
        "img_w_embed": bag.embedding("img_w_embed"),
        "img_h_embed": bag.embedding("img_h_embed"),
        "bbox_head": bag.linear("bbox_head"),
    }
    if "lm_head.bias" in bag.tensors:
        params["lm_head_bias"] = bag.raw("lm_head.bias")
    else:
        params["lm_head_bias"] = jnp.zeros((config.vocab_size,), dtype)
    # lm_head.weight is tied to the embedding (reference :113-116)
    bag.used.add("lm_head.weight")
    bag.warn_unused("foundation")
    return params
