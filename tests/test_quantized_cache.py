"""Int8 KV cache: quantization roundtrip + decode trajectory agreement with
the bf16 cache (TPU counterpart of the reference's HQQ cache variant)."""

import numpy as np
import pytest


def test_quantize_roundtrip():
    import jax.numpy as jnp

    from surya_tpu.models import qwen_decoder as qd

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 4, 16)) * 0.5, jnp.float32)
    q, s = qd.quantize_kv(x)
    back = qd.dequantize_kv(q, s, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert err < 0.02


def test_quantized_decode_matches():
    """Decode with int8 cache must track the fp32-cache trajectory closely:
    same greedy tokens AND close confidence scores. Comparing scores (not just
    argmax) catches the class of bug where within-chunk KV is corrupted by an
    unsafe cast into int8 chunk buffers — a tiny random model's argmax alone
    is insensitive to that."""
    import warnings

    import jax
    import jax.numpy as jnp

    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

    enc = qwen_encoder.EncoderConfig(depth=1, hidden_size=64, intermediate_size=128, num_heads=4, window_size=56, out_hidden_size=64, fullatt_block_indexes=())
    dec = qwen_decoder.DecoderConfig(vocab_size=64, hidden_size=64, intermediate_size=128, num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2)
    cfg = foundation.FoundationConfig(vocab_size=64, encoder=enc, decoder=dec)
    params = foundation.init_params(cfg, jax.random.PRNGKey(1))

    tokens = jnp.asarray(np.array([5, 9], np.int32))
    active = jnp.ones(2, bool)

    def run(quantize):
        cache = qwen_decoder.init_cache(dec, 2, 32, jnp.float32, quantize=quantize)
        # prefill a short prompt so the cache piece is non-empty
        embeds = foundation.embed_prompt_tokens(
            params, cfg, jnp.asarray(np.array([[3, 4, 5], [6, 7, 8]], np.int32)),
            jnp.full((2, 3), -1, jnp.int32), jnp.zeros((1, 64)),
        )
        new_k, new_v, _ = qwen_decoder.prefill(params["decoder"], dec, embeds, jnp.asarray(np.array([3, 3], np.int32)))
        cache = qwen_decoder.merge_prefill(cache, new_k, new_v, jnp.asarray(np.array([3, 3], np.int32)), jnp.arange(2))
        # two chunks so the second chunk attends over COMMITTED (quantized)
        # decode KV as well as fresh within-chunk KV
        cache, t1, s1, *_rest, last, act = foundation.decode_chunk(params, cfg, cache, tokens, active, num_steps=3)
        _, t2, s2, *_ = foundation.decode_chunk(params, cfg, cache, last, act, num_steps=3)
        return np.concatenate([np.asarray(t1), np.asarray(t2)], 1), np.concatenate([np.asarray(s1), np.asarray(s2)], 1)

    with warnings.catch_warnings():
        # an int8 chunk buffer manifests as jax's "cannot safely cast" warning
        warnings.filterwarnings("error", message=".*cannot safely cast.*")
        toks_f, scores_f = run(False)
        toks_q, scores_q = run(True)

    assert np.array_equal(toks_f, toks_q)
    np.testing.assert_allclose(scores_q, scores_f, atol=0.02)
