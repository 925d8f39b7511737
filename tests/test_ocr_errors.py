"""OCR error predictor tests: pipeline mechanics with a tiny random model,
plus numeric parity of the DistilBERT transcription vs HF transformers."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ocr_error_predictor():
    from surya_tpu.ocr_error import OCRErrorPredictor

    return OCRErrorPredictor(tiny=True)


def test_ocr_error_detection(ocr_error_predictor):
    texts = ["The quick brown fox jumps over the lazy dog.", "Th3 qu1ck br0wn f0x jumps 0v3r"]
    result = ocr_error_predictor(texts)
    assert result.texts == texts
    assert len(result.labels) == 2
    assert all(label in ("good", "bad") for label in result.labels)


def test_distilbert_parity():
    torch = pytest.importorskip("torch")
    from transformers import DistilBertConfig as HFConfig
    from transformers import DistilBertForSequenceClassification

    torch.manual_seed(0)
    hf_cfg = HFConfig(vocab_size=100, n_layers=2, n_heads=4, dim=64, hidden_dim=128, num_labels=2)
    tm = DistilBertForSequenceClassification(hf_cfg).eval()

    from surya_tpu.common.weights import from_torch_state_dict
    from surya_tpu.models import distilbert

    cfg = distilbert.DistilBertConfig(vocab_size=100, n_layers=2, n_heads=4, dim=64, hidden_dim=128)
    params = distilbert.convert_torch(from_torch_state_dict(tm.state_dict()), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, (2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    mask[1, 10:] = 0

    with torch.no_grad():
        t_logits = tm(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).logits.numpy()

    import jax.numpy as jnp

    m_logits = np.asarray(distilbert.apply(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    assert np.abs(m_logits - t_logits).max() < 1e-4


def test_wordpiece_tokenizer():
    from surya_tpu.ocr_error.tokenizer import WordPieceTokenizer

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "hello": 4, "wor": 5, "##ld": 6, ",": 7}
    tok = WordPieceTokenizer(vocab=vocab)
    ids = tok.encode("Hello, world")
    assert ids == [2, 4, 7, 5, 6, 3]

    batch = tok(["hello", "hello world"])
    assert len(batch["input_ids"][0]) == len(batch["input_ids"][1])
    assert batch["attention_mask"][0][-1] == 0  # padded


def test_load_predictors_registry():
    from surya_tpu.models_registry import load_predictors

    # constructing all five full-size predictors is covered by other tests;
    # here just check the registry exposes the right keys lazily
    import inspect

    src = inspect.getsource(load_predictors)
    for key in ("layout", "ocr_error", "recognition", "detection", "table_rec"):
        assert f'"{key}"' in src
