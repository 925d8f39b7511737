"""Weight-only int8 decoder quantization (RECOGNITION_WEIGHT_QUANTIZE):
numeric closeness of the quantized projections and of full decode
trajectories vs the float path."""

import numpy as np


def test_quantize_linear_roundtrip():
    import jax
    import jax.numpy as jnp

    from surya_tpu import nn

    p = nn.linear_init(jax.random.PRNGKey(0), 64, 128, bias=True)
    q = nn.quantize_linear(p)
    assert q["kernel_q"].dtype == jnp.int8
    assert "bias" in q

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 64)), jnp.float32)
    y_f = np.asarray(nn.linear(p, x))
    y_q = np.asarray(nn.linear(q, x))
    denom = np.abs(y_f).max()
    assert np.abs(y_q - y_f).max() / denom < 0.02
    # idempotent / non-destructive
    assert nn.quantize_linear(q) is q


def test_quantized_decoder_trajectory():
    """Greedy decode with int8 decoder weights tracks the float trajectory:
    same tokens, close scores on a tiny seeded model."""
    import copy

    import jax
    import jax.numpy as jnp

    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

    enc = qwen_encoder.EncoderConfig(depth=1, hidden_size=64, intermediate_size=128, num_heads=4, window_size=56, out_hidden_size=64, fullatt_block_indexes=())
    dec = qwen_decoder.DecoderConfig(vocab_size=64, hidden_size=64, intermediate_size=128, num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2)
    cfg = foundation.FoundationConfig(vocab_size=64, encoder=enc, decoder=dec)
    params = foundation.init_params(cfg, jax.random.PRNGKey(1))
    params_q = copy.deepcopy(params)
    params_q["decoder"] = qwen_decoder.quantize_weights(params_q["decoder"])

    tokens = jnp.asarray(np.array([5, 9], np.int32))
    active = jnp.ones(2, bool)
    prompt = jnp.asarray(np.array([[3, 4, 5], [6, 7, 8]], np.int32))
    lens = jnp.asarray(np.array([3, 3], np.int32))

    def run(p):
        cache = qwen_decoder.init_cache(dec, 2, 32, jnp.float32)
        embeds = foundation.embed_prompt_tokens(
            p, cfg, prompt, jnp.full((2, 3), -1, jnp.int32), jnp.zeros((1, 64)),
        )
        new_k, new_v, _ = qwen_decoder.prefill(p["decoder"], dec, embeds, lens)
        cache = qwen_decoder.merge_prefill(cache, new_k, new_v, lens, jnp.arange(2))
        _, toks, scores, *_ = foundation.decode_chunk(p, cfg, cache, tokens, active, num_steps=6)
        return np.asarray(toks), np.asarray(scores)

    toks_f, scores_f = run(params)
    toks_q, scores_q = run(params_q)
    assert np.array_equal(toks_f, toks_q)
    np.testing.assert_allclose(scores_q, scores_f, atol=0.05)
