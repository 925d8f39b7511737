"""Production-config parity of the recognition foundation model.

The fast parity suite uses small random configs; this tier instantiates the
reference torch SuryaModel at the PRODUCTION architecture (encoder depth 8 /
hidden 1280, decoder 10 layers / hidden 1536 / GQA 12:4 — the dims the real
checkpoint ships, surya_tpu/recognition/loader.py DEFAULT_*) and checks:

  - fp32 prefill logits/bbox parity at depth-scaled tolerance
  - bf16 (TPU compute dtype) parity: greedy token identical, logits within
    bf16 drift — the numeric regime the real checkpoint runs in on TPU

Opt-in (RUN_PRODUCTION_TESTS=1, ~0.5B params on CPU):

    RUN_PRODUCTION_TESTS=1 python -m pytest tests/test_production_parity.py -m production -q
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.production,
    pytest.mark.skipif(
        not os.environ.get("RUN_PRODUCTION_TESTS"),
        reason="production-size tier is opt-in (RUN_PRODUCTION_TESTS=1)",
    ),
]

GRIDS = [(6, 8), (4, 6)]
PATCH_DIM = 3 * 1 * 14 * 14
IMG, BOS, EOI, PAD = 3, 0, 1, 2
VOCAB = 65825  # offline tokenizer layout: 256 byte-fallback + 33 specials + 65536


@pytest.fixture(scope="module")
def torch_model():
    from surya.common.surya import SuryaModel
    from surya.common.surya.config import SuryaModelConfig

    from surya_tpu.recognition.loader import DEFAULT_DECODER, DEFAULT_ENCODER

    torch.manual_seed(0)
    cfg = SuryaModelConfig(
        vocab_size=VOCAB,
        vision_encoder=dict(
            depth=DEFAULT_ENCODER["depth"], hidden_size=DEFAULT_ENCODER["hidden_size"],
            intermediate_size=DEFAULT_ENCODER["intermediate_size"],
            num_heads=DEFAULT_ENCODER["num_heads"], patch_size=14,
            spatial_merge_size=2, temporal_patch_size=1,
            window_size=DEFAULT_ENCODER["window_size"],
            out_hidden_size=DEFAULT_ENCODER["out_hidden_size"],
            fullatt_block_indexes=list(DEFAULT_ENCODER["fullatt_block_indexes"]),
        ),
        decoder=dict(
            vocab_size=VOCAB, hidden_size=DEFAULT_DECODER["hidden_size"],
            intermediate_size=DEFAULT_DECODER["intermediate_size"],
            num_hidden_layers=DEFAULT_DECODER["num_hidden_layers"],
            num_attention_heads=DEFAULT_DECODER["num_attention_heads"],
            num_key_value_heads=DEFAULT_DECODER["num_key_value_heads"],
            rope_theta=DEFAULT_DECODER["rope_theta"], max_position_embeddings=1536,
        ),
    )
    for c in (cfg, cfg.vision_encoder, cfg.decoder):
        c._attn_implementation = "eager"
    model = SuryaModel(cfg).eval()
    model.tie_weights()
    return model


@pytest.fixture(scope="module")
def my_params(torch_model):
    from surya_tpu.common.weights import from_torch_state_dict
    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder
    from surya_tpu.recognition.loader import DEFAULT_DECODER, DEFAULT_ENCODER

    enc = qwen_encoder.EncoderConfig(**DEFAULT_ENCODER)
    dec = qwen_decoder.DecoderConfig(vocab_size=VOCAB, **DEFAULT_DECODER)
    cfg = foundation.FoundationConfig(vocab_size=VOCAB, encoder=enc, decoder=dec)
    params = foundation.convert_torch(from_torch_state_dict(torch_model.state_dict()), cfg)
    return params, cfg


def _build_inputs():
    rng = np.random.default_rng(0)
    patches = [rng.standard_normal((h * w, PATCH_DIM), dtype=np.float32) * 0.5 for h, w in GRIDS]
    n_tok = [h * w // 4 for h, w in GRIDS]
    rows = [[IMG] * nt + [4, 5, 6, 7] + [BOS, 10 + i, 20 + i, EOI] for i, nt in enumerate(n_tok)]
    return patches, n_tok, rows


def _torch_last_logits(torch_model, rows, patches):
    maxlen = max(len(r) for r in rows)
    ids = torch.full((len(rows), maxlen), PAD, dtype=torch.long)
    mask = torch.zeros((len(rows), maxlen), dtype=torch.long)
    for i, r in enumerate(rows):
        ids[i, maxlen - len(r):] = torch.tensor(r)
        mask[i, maxlen - len(r):] = 1
    pos = (mask.cumsum(-1) - 1).clamp(min=0) * mask
    tiles = torch.from_numpy(np.concatenate(patches))
    grid = torch.tensor([[1, h, w] for h, w in GRIDS])
    with torch.no_grad():
        out = torch_model(
            input_ids=ids, image_tiles=tiles, grid_thw=grid,
            attention_mask=mask, position_ids=pos, logits_to_keep=1,
            encoder_chunk_size=32768, use_cache=False,
        )
    return out["lm_logits"][:, -1].numpy(), out["bbox_logits"][:, -1].numpy()


def _my_last_logits(params, cfg, rows, patches, n_tok, dtype):
    import jax
    import jax.numpy as jnp

    from surya_tpu import nn
    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

    if dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params
        )

    layout = qwen_encoder.plan_layout(GRIDS, cfg.encoder, 128)
    raw = np.zeros((128, PATCH_DIM), np.float32)
    cat = np.concatenate(patches)
    raw[: cat.shape[0]] = cat
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

    enc_args = tuple(jnp.asarray(a) for a in layout.device_args)
    patches_in = jnp.asarray(raw).astype(dtype) if dtype is not None else jnp.asarray(raw)
    img_tokens = foundation.encode_images(
        params, cfg, patches_in, enc_args,
        jnp.asarray(layout.llm_h_idx), jnp.asarray(layout.llm_w_idx),
        layout.kv_range, layout.win_range,
    )
    embeds = foundation.embed_prompt_tokens(params, cfg, jnp.asarray(ids), jnp.asarray(gather), img_tokens)
    _, _, last_hidden = qwen_decoder.prefill(params["decoder"], cfg.decoder, embeds, jnp.asarray(lens))
    lm = np.asarray(
        (last_hidden @ params["token_embed"]["embedding"].T + params["lm_head_bias"]).astype(jnp.float32)
    )
    bbox = np.asarray(jax.nn.sigmoid(nn.linear(params["bbox_head"], last_hidden)).astype(jnp.float32))
    return lm, bbox


def test_production_prefill_parity_fp32(torch_model, my_params):
    params, cfg = my_params
    patches, n_tok, rows = _build_inputs()
    t_lm, t_bbox = _torch_last_logits(torch_model, rows, patches)
    m_lm, m_bbox = _my_last_logits(params, cfg, rows, patches, n_tok, dtype=None)
    assert np.array_equal(m_lm.argmax(-1), t_lm.argmax(-1))
    assert np.abs(m_lm - t_lm).max() < 5e-3, np.abs(m_lm - t_lm).max()
    assert np.abs(m_bbox - t_bbox).max() < 1e-3, np.abs(m_bbox - t_bbox).max()


def test_production_prefill_parity_bf16(torch_model, my_params):
    import jax.numpy as jnp

    params, cfg = my_params
    patches, n_tok, rows = _build_inputs()
    t_lm, t_bbox = _torch_last_logits(torch_model, rows, patches)
    m_lm, m_bbox = _my_last_logits(params, cfg, rows, patches, n_tok, dtype=jnp.bfloat16)
    # bf16 is the TPU compute dtype: the greedy token must survive the drift
    assert np.array_equal(m_lm.argmax(-1), t_lm.argmax(-1))
    # bf16 error accumulates relative to the logit SCALE (dot-product
    # magnitudes), not per element
    rel = np.abs(m_lm - t_lm).max() / np.abs(t_lm).max()
    assert rel < 0.005, rel
    assert np.abs(m_bbox - t_bbox).max() < 2e-2, np.abs(m_bbox - t_bbox).max()
