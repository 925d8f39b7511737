"""Numeric parity of the JAX table-rec stack (DonutSwin + ADETR multi-head
decoder) vs the reference torch TableRecEncoderDecoderModel with random small
weights (reference surya/table_rec/model/decoder.py:12-160). Covers the
LabelEmbedding (corner-derived box embeds + property embeds), the trunk, and
all five property heads across prefill + AR steps."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

B = 2
IMG = 128  # -> swin grid 32, two stages
L = 3  # prompt rows
STEPS = 4
SPECIAL = 5
BOX_DIM = 1024


@pytest.fixture(scope="module")
def torch_model():
    from surya.table_rec.model.config import (
        DonutSwinTableRecConfig,
        SuryaTableRecConfig,
        SuryaTableRecDecoderConfig,
    )
    from surya.table_rec.model.encoderdecoder import TableRecEncoderDecoderModel

    torch.manual_seed(0)
    enc_cfg = DonutSwinTableRecConfig(
        image_size=(IMG, IMG), embed_dim=16, depths=[1, 1], num_heads=[2, 4],
        num_kv_heads=[2, 4], window_size=8, encoder_length=1024,
    )
    dec_cfg = SuryaTableRecDecoderConfig(
        num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        encoder_hidden_size=enc_cfg.hidden_size, num_attention_heads=4,
        num_key_value_heads=2, property_embed_size=8, box_embed_size=24,
        cross_attn_layers=(0, 1), self_attn_layers=(0, 1), global_attn_layers=(0, 1),
    )
    cfg = SuryaTableRecConfig(encoder=enc_cfg, decoder=dec_cfg)
    cfg.encoder = enc_cfg
    cfg.decoder = dec_cfg
    model = TableRecEncoderDecoderModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def my_model(torch_model):
    from surya_tpu.common.weights import from_torch_state_dict
    from surya_tpu.models import adetr, donut_swin, table_rec_model

    enc = donut_swin.DonutSwinConfig(
        image_size=(IMG, IMG), embed_dim=16, depths=(1, 1), num_heads=(2, 4),
        num_kv_heads=(2, 4), window_size=8, encoder_length=1024,
    )
    dec = adetr.ADETRConfig(
        num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        encoder_hidden_size=enc.hidden_size, num_attention_heads=4,
        num_key_value_heads=2, cross_attn_layers=(0, 1), self_attn_layers=(0, 1),
        double_residual_flow=False,
    )
    cfg = table_rec_model.TableRecConfig(
        property_embed_size=8, box_embed_size=24, max_boxes=10, encoder=enc, decoder=dec
    )
    params = table_rec_model.convert_torch(from_torch_state_dict(torch_model.state_dict()), cfg)
    return params, cfg


def _prompt():
    # query row + bos-ish rows: [bbox6, category, merges, colspan, is_header],
    # classification fields pre-shifted by SPECIAL (shaper.dict_to_labels)
    return np.array(
        [
            [
                [10, 12, 900, 800, 512, 512, 4 + SPECIAL, 0 + SPECIAL, 0, 0 + SPECIAL],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [4, 4, 4, 4, 4, 4, 4, 4, 4, 4],
            ]
        ]
        * B,
        np.int64,
    )


def test_table_rec_encoder_parity(torch_model, my_model):
    from surya_tpu.models import donut_swin

    params, cfg = my_model
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((B, IMG, IMG, 3), dtype=np.float32) * 0.5

    with torch.no_grad():
        t_out = torch_model.encoder(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    import jax.numpy as jnp

    m_out = np.asarray(donut_swin.apply(params["encoder"], cfg.encoder, jnp.asarray(pixels)))
    assert m_out.shape == t_out.shape
    assert np.abs(m_out - t_out).max() < 2e-4, np.abs(m_out - t_out).max()


def test_table_rec_decoder_ar_parity(torch_model, my_model):
    """Reference inference loop (surya/table_rec/__init__.py:35-132): prefill
    the prompt, then AR steps, feeding back the processed property vector.
    Both sides receive identical feedback (derived from the torch outputs) so
    the comparison is unconditional on argmax ties."""
    import jax.numpy as jnp

    from surya_tpu.models import adetr, table_rec_model

    params, cfg = my_model
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((B, IMG, IMG, 3), dtype=np.float32) * 0.5
    prompt = _prompt()
    KEYS = ("bbox", "category", "merges", "colspan", "is_header")

    def next_vector(logits):
        """shaper.dict_to_labels on the processed outputs (classification
        argmax stays raw = shifted; bbox/colspan truncate to long)."""
        bbox = np.clip(logits["bbox"] * BOX_DIM, 0, BOX_DIM).astype(np.int64)
        cat = logits["category"].argmax(-1).astype(np.int64)
        mrg = logits["merges"].argmax(-1).astype(np.int64)
        col = np.round(np.maximum(logits["colspan"][..., 0], 1.0)).astype(np.int64)
        hdr = logits["is_header"].argmax(-1).astype(np.int64)
        return np.concatenate(
            [bbox, cat[:, None], mrg[:, None], col[:, None], hdr[:, None]], axis=-1
        )

    with torch.no_grad():
        enc = torch_model.encoder(pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)))[0]
        torch_model.decoder.model._setup_cache(torch_model.config, B, "cpu", torch.float32)
        ids = torch.from_numpy(prompt)
        pos = torch.arange(L, dtype=torch.long)
        t_steps = []
        for step in range(STEPS + 1):
            out = torch_model.decoder(
                input_ids=ids, encoder_hidden_states=enc,
                cache_position=pos, use_cache=True, prefill=step == 0,
            )
            logits = {k: out["box_property_logits"][k][:, -1].numpy() for k in KEYS}
            t_steps.append(logits)
            ids = torch.from_numpy(next_vector(logits)).unsqueeze(1)
            pos = pos[-1:] + 1

    enc_j = jnp.asarray(enc.numpy())
    cross_k, cross_v = adetr.precompute_cross_kv(params["decoder"], cfg.decoder, enc_j)
    cache = adetr.init_cache(cfg.decoder, B, L + STEPS + 1, jnp.float32)
    seq_lens = jnp.full((B,), L, jnp.int32)
    emb = table_rec_model.embed_labels(params, cfg, jnp.asarray(prompt))
    cache, hidden = adetr.prefill(params["decoder"], cfg.decoder, cache, cross_k, cross_v, emb, seq_lens)

    for step in range(STEPS + 1):
        mine = table_rec_model._heads(params, cfg, hidden)
        for k in KEYS:
            diff = np.abs(np.asarray(mine[k]) - t_steps[step][k]).max()
            assert diff < 2e-3, (step, k, diff)
        vec = next_vector(t_steps[step])
        emb = table_rec_model.embed_labels(params, cfg, jnp.asarray(vec))
        cache, hidden = adetr.step(
            params["decoder"], cfg.decoder, cache, cross_k, cross_v, emb,
            pos=seq_lens + step, write_idx=jnp.full((B,), L + step, jnp.int32),
            seq_lens=seq_lens, prompt_len=L,
        )
