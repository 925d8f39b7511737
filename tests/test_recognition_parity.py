"""Numeric parity of the JAX recognition foundation model vs the reference
torch SuryaModel (random small config): prefill logits, bbox head, and the
on-device greedy decode loop vs torch incremental decoding."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

GRIDS = [(6, 8), (4, 6)]
PATCH_DIM = 3 * 1 * 14 * 14
IMG, BOS, EOI, PAD = 3, 0, 1, 2
VOCAB = 512


@pytest.fixture(scope="module")
def torch_model():
    from surya.common.surya import SuryaModel
    from surya.common.surya.config import SuryaModelConfig

    torch.manual_seed(0)
    cfg = SuryaModelConfig(
        vocab_size=VOCAB,
        vision_encoder=dict(
            depth=4, hidden_size=64, intermediate_size=128, num_heads=4,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=1,
            window_size=56, out_hidden_size=96, fullatt_block_indexes=[1, 3],
        ),
        decoder=dict(
            vocab_size=VOCAB, hidden_size=96, intermediate_size=192,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, max_position_embeddings=1024,
        ),
    )
    for c in (cfg, cfg.vision_encoder, cfg.decoder):
        c._attn_implementation = "eager"
    model = SuryaModel(cfg).eval()
    model.tie_weights()
    return model


@pytest.fixture(scope="module")
def my_model(torch_model):
    from surya_tpu.common.weights import from_torch_state_dict
    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

    enc = qwen_encoder.EncoderConfig(
        depth=4, hidden_size=64, intermediate_size=128, num_heads=4,
        window_size=56, out_hidden_size=96, fullatt_block_indexes=(1, 3),
    )
    dec = qwen_decoder.DecoderConfig(
        vocab_size=VOCAB, hidden_size=96, intermediate_size=192,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    cfg = foundation.FoundationConfig(vocab_size=VOCAB, encoder=enc, decoder=dec)
    params = foundation.convert_torch(from_torch_state_dict(torch_model.state_dict()), cfg)
    return params, cfg


def _build_inputs():
    rng = np.random.default_rng(0)
    patches = [rng.standard_normal((h * w, PATCH_DIM), dtype=np.float32) * 0.5 for h, w in GRIDS]
    n_tok = [h * w // 4 for h, w in GRIDS]
    rows = [[IMG] * nt + [4, 5, 6, 7] + [BOS, 10 + i, 20 + i, EOI] for i, nt in enumerate(n_tok)]
    return patches, n_tok, rows


def _torch_batch(rows, patches):
    maxlen = max(len(r) for r in rows)
    ids = torch.full((len(rows), maxlen), PAD, dtype=torch.long)
    mask = torch.zeros((len(rows), maxlen), dtype=torch.long)
    for i, r in enumerate(rows):
        ids[i, maxlen - len(r):] = torch.tensor(r)
        mask[i, maxlen - len(r):] = 1
    pos = (mask.cumsum(-1) - 1).clamp(min=0) * mask
    tiles = torch.from_numpy(np.concatenate(patches))
    grid = torch.tensor([[1, h, w] for h, w in GRIDS])
    return ids, mask, pos, tiles, grid


def _my_batch(rows, n_tok):
    maxlen = max(len(r) for r in rows)
    ids = np.full((len(rows), maxlen), PAD, np.int32)
    gather = np.full((len(rows), maxlen), -1, np.int32)
    lens = np.array([len(r) for r in rows], np.int32)
    base = 0
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        for j, t in enumerate(r):
            if t == IMG:
                gather[i, j] = base + j
        base += n_tok[i]
    return ids, gather, lens


def test_prefill_parity(torch_model, my_model):
    import jax.numpy as jnp

    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

    params, cfg = my_model
    patches, n_tok, rows = _build_inputs()
    t_ids, t_mask, t_pos, t_tiles, t_grid = _torch_batch(rows, patches)

    with torch.no_grad():
        out = torch_model(
            input_ids=t_ids, image_tiles=t_tiles, grid_thw=t_grid,
            attention_mask=t_mask, position_ids=t_pos, logits_to_keep=1,
            encoder_chunk_size=32768, use_cache=False,
        )
    t_lm = out["lm_logits"][:, -1].numpy()
    t_bbox = out["bbox_logits"][:, -1].numpy()

    layout = qwen_encoder.plan_layout(GRIDS, cfg.encoder, 128)
    raw = np.zeros((128, PATCH_DIM), np.float32)
    cat = np.concatenate(patches)
    raw[: cat.shape[0]] = cat
    m_ids, m_gather, seq_lens = _my_batch(rows, n_tok)

    enc_args = tuple(jnp.asarray(a) for a in layout.device_args)
    img_tokens = foundation.encode_images(
        params, cfg, jnp.asarray(raw), enc_args,
        jnp.asarray(layout.llm_h_idx), jnp.asarray(layout.llm_w_idx),
        layout.kv_range, layout.win_range,
    )
    embeds = foundation.embed_prompt_tokens(params, cfg, jnp.asarray(m_ids), jnp.asarray(m_gather), img_tokens)
    _, _, last_hidden = qwen_decoder.prefill(params["decoder"], cfg.decoder, embeds, jnp.asarray(seq_lens))
    m_lm = np.asarray(last_hidden @ params["token_embed"]["embedding"].T + params["lm_head_bias"])

    import jax

    from surya_tpu import nn

    m_bbox = np.asarray(jax.nn.sigmoid(nn.linear(params["bbox_head"], last_hidden)))

    assert np.abs(m_lm - t_lm).max() < 2e-3
    assert np.abs(m_bbox - t_bbox).max() < 1e-4


def test_decode_loop_parity(torch_model, my_model):
    """Greedy continuation: my on-device decode_chunk must emit the same
    tokens as torch incremental decoding with a DynamicCache."""
    import jax.numpy as jnp

    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

    params, cfg = my_model
    patches, n_tok, rows = _build_inputs()
    t_ids, t_mask, t_pos, t_tiles, t_grid = _torch_batch(rows, patches)

    STEPS = 8
    # torch greedy loop
    from transformers import DynamicCache

    kv = DynamicCache()
    with torch.no_grad():
        out = torch_model(
            input_ids=t_ids, image_tiles=t_tiles, grid_thw=t_grid,
            attention_mask=t_mask, position_ids=t_pos, logits_to_keep=1,
            encoder_chunk_size=32768, use_cache=True, past_key_values=kv,
        )
        torch_tokens = [out["lm_logits"][:, -1].argmax(-1)]
        mask = t_mask
        pos = t_pos[:, -1:] + 1
        for _ in range(STEPS):
            mask = torch.nn.functional.pad(mask, (0, 1), value=1)
            out = torch_model(
                input_ids=torch_tokens[-1][:, None], attention_mask=mask,
                position_ids=pos, use_cache=True, past_key_values=kv, logits_to_keep=1,
            )
            torch_tokens.append(out["lm_logits"][:, -1].argmax(-1))
            pos = pos + 1
    torch_tokens = torch.stack(torch_tokens, 1).numpy()  # [B, STEPS+1]

    # mine: fused prefill into cache + decode_chunk
    layout = qwen_encoder.plan_layout(GRIDS, cfg.encoder, 128)
    raw = np.zeros((128, PATCH_DIM), np.float32)
    cat = np.concatenate(patches)
    raw[: cat.shape[0]] = cat
    m_ids, m_gather, seq_lens = _my_batch(rows, n_tok)

    cache = qwen_decoder.init_cache(cfg.decoder, n_slots=3, max_seq=64, dtype=jnp.float32)
    enc_args = tuple(jnp.asarray(a) for a in layout.device_args)
    cache, tok0, score0, bbox0 = foundation.prefill(
        params, cfg, cache, jnp.asarray(raw), enc_args,
        jnp.asarray(layout.llm_h_idx), jnp.asarray(layout.llm_w_idx),
        jnp.asarray(m_ids), jnp.asarray(m_gather), jnp.asarray(seq_lens),
        jnp.asarray(np.array([0, 1], np.int32)),
        kv_range=layout.kv_range, win_range=layout.win_range,
    )
    assert np.array_equal(np.asarray(tok0), torch_tokens[:, 0])

    last = jnp.zeros(3, jnp.int32).at[:2].set(tok0)
    active = jnp.asarray(np.array([True, True, False]))
    cache, toks, scores, bboxes, last, active = foundation.decode_chunk(
        params, cfg, cache, last, active, num_steps=STEPS
    )
    my_tokens = np.asarray(toks)[:2]
    # compare while both rows are active (torch loop has no EOS stop)
    for b in range(2):
        for s in range(STEPS):
            expected = torch_tokens[b, s + 1]
            assert my_tokens[b, s] == expected, (b, s, my_tokens[b], torch_tokens[b])
            if expected in (cfg.eos_token_id, cfg.pad_token_id):
                break
