"""Numeric parity of the JAX layout stack (DonutSwin + ADETR decoder) vs the
reference torch SuryaLayoutModel with random small weights."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

B = 2
IMG = 128  # -> swin grid 32, two stages


@pytest.fixture(scope="module")
def torch_model():
    from surya.layout.model.config import (
        DonutSwinLayoutConfig,
        SuryaLayoutConfig,
        SuryaLayoutDecoderConfig,
    )
    from surya.layout.model.encoderdecoder import SuryaLayoutModel

    torch.manual_seed(0)
    enc_cfg = DonutSwinLayoutConfig(
        image_size=(IMG, IMG), embed_dim=16, depths=[1, 1], num_heads=[2, 4],
        num_kv_heads=[2, 4], window_size=8, encoder_length=1024,
    )
    dec_cfg = SuryaLayoutDecoderConfig(
        num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        encoder_hidden_size=enc_cfg.hidden_size, num_attention_heads=4,
        num_key_value_heads=2, cross_attn_layers=(0, 1), self_attn_layers=(0, 1),
        global_attn_layers=(0, 1),
    )
    cfg = SuryaLayoutConfig(encoder=enc_cfg, decoder=dec_cfg)
    cfg.encoder = enc_cfg
    cfg.decoder = dec_cfg
    model = SuryaLayoutModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def my_model(torch_model):
    from surya_tpu.common.weights import from_torch_state_dict
    from surya_tpu.models import adetr, donut_swin, layout_model

    enc = donut_swin.DonutSwinConfig(
        image_size=(IMG, IMG), embed_dim=16, depths=(1, 1), num_heads=(2, 4),
        num_kv_heads=(2, 4), window_size=8, encoder_length=1024,
    )
    dec = adetr.ADETRConfig(
        num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        encoder_hidden_size=enc.hidden_size, num_attention_heads=4,
        num_key_value_heads=2, cross_attn_layers=(0, 1), self_attn_layers=(0, 1),
    )
    cfg = layout_model.LayoutConfig(max_boxes=10, encoder=enc, decoder=dec)
    params = layout_model.convert_torch(from_torch_state_dict(torch_model.state_dict()), cfg)
    return params, cfg


def test_swin_encoder_parity(torch_model, my_model):
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


def test_decoder_ar_parity(torch_model, my_model):
    """Run the reference torch AR loop 4 steps and compare my in-graph
    generate()'s recorded boxes/logits."""
    import jax.numpy as jnp

    from surya_tpu.models import adetr, layout_model

    params, cfg = my_model
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((B, IMG, IMG, 3), dtype=np.float32) * 0.5

    STEPS = 4
    with torch.no_grad():
        enc = torch_model.encoder(pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)))[0]
        torch_model.decoder.model._setup_cache(torch_model.config, B, "cpu", torch.float32)
        box_in = torch.ones((B, 1, 7), dtype=torch.long)  # bos=1
        pos = torch.zeros(1, dtype=torch.long)
        t_boxes, t_logits = [], []
        for step in range(STEPS):
            out = torch_model.decoder(
                input_boxes=box_in, encoder_hidden_states=enc,
                cache_position=pos, use_cache=True, prefill=step == 0,
            )
            box_logits = out["bbox_logits"][:, -1]
            class_logits = out["class_logits"][:, -1]
            class_preds = class_logits.argmax(-1)
            box_preds = box_logits * torch_model.config.decoder.bbox_size
            t_boxes.append(box_preds.numpy())
            t_logits.append(class_logits.numpy())
            box_in = torch.cat([box_preds.unsqueeze(1), class_preds[:, None, None]], dim=-1).to(torch.long)
            pos = pos[-1:] + 1

    # mine: step the trunk directly with the same feedback rule (no
    # header/footer rewrite — tiny random weights rarely trigger it, and we
    # compare raw head outputs)
    enc_j = jnp.asarray(enc.numpy())
    cross_k, cross_v = adetr.precompute_cross_kv(params["decoder"], cfg.decoder, enc_j)
    cache = adetr.init_cache(cfg.decoder, B, 16, jnp.float32)
    last_box = np.ones((B, 7), np.int32)
    for step in range(STEPS):
        emb = layout_model.embed_boxes(params, cfg, jnp.asarray(last_box))
        cache, hidden = adetr.step(
            params["decoder"], cfg.decoder, cache, cross_k, cross_v, emb,
            jnp.full((B,), step, jnp.int32),
        )
        class_logits, bbox = layout_model._heads(params, cfg, hidden)
        box_f = np.asarray(bbox) * cfg.bbox_size
        assert np.abs(box_f - t_boxes[step]).max() < 2e-3, (step, np.abs(box_f - t_boxes[step]).max())
        assert np.abs(np.asarray(class_logits) - t_logits[step]).max() < 2e-3
        cls = np.asarray(class_logits).argmax(-1)
        last_box = np.concatenate([box_f.astype(np.int32), cls[:, None].astype(np.int32)], axis=-1)
