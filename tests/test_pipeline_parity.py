"""Pipeline-level production parity: one synthetic page through BOTH full
det→slice→rec pipelines — the reference torch stack
(surya/recognition/__init__.py:773-942 with surya/detection) and this repo's
TPU-native predictors — at PRODUCTION model dims with the recognition side in
bf16 (the TPU compute regime). Line texts and polygons must match.

Both sides share the same random torch weights (converted with the production
converters), the same offline tokenizer layout (FakeQwen byte-fallback BPE, as
in test_tokenizer_parity), and the same synthetic blob heatmap hook on the
detection tail (random detection weights produce noise heatmaps whose dynamic
CRAFT thresholds are not numerically stable across implementations; the blob
hook keeps the full forward cost and makes the heatmap a pure function of the
page, exactly like bench.py / test_device_postprocess).

Opt-in (RUN_PRODUCTION_TESTS=1, ~0.5B params on CPU):

    RUN_PRODUCTION_TESTS=1 python -m pytest tests/test_pipeline_parity.py -m production -q
"""

import os
import sys
from collections import deque

import numpy as np
import pytest
from PIL import Image, ImageDraw

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

def _ensure_quantized_cache_config():
    """This image's transformers dropped QuantizedCacheConfig; the reference
    imports it unconditionally but only uses it when RECOGNITION_MODEL_QUANTIZE
    is on (it isn't here). Must run AFTER the first transformers submodule
    import: transformers' lazy loader replaces the sys.modules entry then,
    dropping attributes injected on the original module object."""
    import transformers

    if not hasattr(transformers, "QuantizedCacheConfig"):
        class _QuantizedCacheConfig:
            def __init__(self, *args, **kwargs):
                pass

        transformers.QuantizedCacheConfig = _QuantizedCacheConfig

pytestmark = [
    pytest.mark.production,
    pytest.mark.skipif(
        not os.environ.get("RUN_PRODUCTION_TESTS"),
        reason="production-size tier is opt-in (RUN_PRODUCTION_TESTS=1)",
    ),
]

VOCAB = 65825  # offline tokenizer layout: 256 byte-fallback + 33 specials + 65536
MAX_TOKENS = 12


def _page():
    """Four VISUALLY DISTINCT lines (different widths + stripe patterns):
    identical lines would let a pipeline that ignores pixel content match a
    correct one by emitting the same tokens for every line."""
    img = Image.new("RGB", (512, 384), "white")
    d = ImageDraw.Draw(img)
    widths = (420, 300, 360, 240)
    for i, w in enumerate(widths):
        y0 = 40 + i * 80
        d.rectangle((40, y0, 40 + w, y0 + 22), fill="black")
        for x in range(48, 40 + w - 8, 14 + 3 * i):  # per-line stripe cadence
            d.rectangle((x, y0 + 4, x + 4, y0 + 18), fill="white")
    return img


# -- reference side (offline construction: no network, no loader) -------------


def _ref_tokenizer():
    from surya.common.surya.processor.tokenizer import InnerOCRTokenizer, SuryaOCRTokenizer

    from surya_tpu.recognition.tokenizer import DEFAULT_SPECIAL_TOKENS, ByteFallbackMathTokenizer

    class FakeQwen:
        def __init__(self):
            self._inner = ByteFallbackMathTokenizer()

        def __len__(self):
            return len(self._inner)

        def __call__(self, text):
            return {"input_ids": self._inner.encode(text)}

        def decode(self, ids):
            return self._inner.decode(ids)

        def get_vocab(self):
            return {}

    tok = SuryaOCRTokenizer.__new__(SuryaOCRTokenizer)
    tok.special_tokens = DEFAULT_SPECIAL_TOKENS
    tok.qwen_tokenizer = FakeQwen()
    tok.ocr_tokenizer = InnerOCRTokenizer(
        special_tokens=DEFAULT_SPECIAL_TOKENS, qwen_tokenizer=tok.qwen_tokenizer
    )
    tok.system_tokens = {
        v: tok.ocr_tokenizer._tokenize(v)[0] for v in DEFAULT_SPECIAL_TOKENS["system"]
    }
    tok.SPECIAL_TOKEN_MAPPING = tok.ocr_tokenizer.SPECIAL_TOKEN_MAPPING
    tok.qwen_offset = len(tok.qwen_tokenizer)
    tok.special_token_offset = tok.qwen_offset + tok.ocr_tokenizer.SPECIAL_TOKEN_OFFSET
    return tok


def _ref_rec_model():
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


def _ref_det_model():
    from surya.detection.model.config import EfficientViTConfig as TorchCfg
    from surya.detection.model.encoderdecoder import EfficientViTForSemanticSegmentation

    torch.manual_seed(1)
    cfg = TorchCfg()
    cfg.num_labels = 2
    model = EfficientViTForSemanticSegmentation(cfg).eval()
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.02)
                mod.running_var.uniform_(0.7, 1.3)
                mod.weight.normal_(1.0, 0.05)
                mod.bias.normal_(0, 0.02)
    return model


def _blank_and_hook_ref_det(model):
    """Mirror surya_tpu.models.efficientvit.install_blob_detector on the
    torch side: blank the classifier bias to -6 and add 14*blob (4x4 darkness
    max-pool + 3x9 max close) to channel 0 pre-sigmoid."""
    import torch.nn.functional as TF

    from surya_tpu.models.efficientvit import IMAGENET_MEAN, IMAGENET_STD

    # the decode head's final conv ("classifier" in the converted params)
    head_conv = None
    for name, mod in model.named_modules():
        if isinstance(mod, torch.nn.Conv2d) and mod.out_channels == 2:
            head_conv = mod
    assert head_conv is not None
    with torch.no_grad():
        if head_conv.bias is not None:
            head_conv.bias.fill_(-6.0)

    orig_forward = model.forward

    def forward(pixel_values):
        mean = torch.tensor(IMAGENET_MEAN, dtype=torch.float32).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD, dtype=torch.float32).view(1, 3, 1, 1)
        pixels = pixel_values.float() * std + mean
        dark = 1.0 - pixels.min(dim=1).values  # [B, H, W]
        d4 = TF.max_pool2d(dark[:, None], kernel_size=4, stride=4)
        blob = TF.max_pool2d(d4, kernel_size=(3, 9), stride=1, padding=(1, 4))[:, 0]
        out = orig_forward(pixel_values=pixel_values)
        probs = out.logits.float().clamp(1e-6, 1 - 1e-6)
        logits = torch.logit(probs)
        logits[:, 0] = logits[:, 0] + 14.0 * blob
        out.logits = torch.sigmoid(logits)
        return out

    model.forward = forward


@pytest.fixture(scope="module")
def ref_pipeline():
    from surya.common.surya.processor import SuryaOCRProcessor
    from surya.detection import DetectionPredictor as RefDet
    from surya.detection.processor import SegformerImageProcessor

    _ensure_quantized_cache_config()
    from surya.recognition import RecognitionPredictor as RefRec
    from surya.settings import settings as ref_settings

    rec_model = _ref_rec_model()
    det_model = _ref_det_model()
    _blank_and_hook_ref_det(det_model)

    tok = _ref_tokenizer()
    processor = SuryaOCRProcessor(
        ocr_tokenizer=tok,
        blank_bbox_token_id=rec_model.config.blank_bbox_token_id,
        num_register_tokens=rec_model.config.num_register_tokens,
        sequence_length=None,
        patch_size=rec_model.config.vision_encoder.patch_size,
        merge_size=rec_model.config.vision_encoder.spatial_merge_size,
        model_device="cpu",
    )
    rec_model.config.eos_token_id = processor.eos_token_id
    rec_model.config.pad_token_id = processor.pad_token_id
    rec_model.config.bos_token_id = processor.bos_token_id
    # the loader gets this from the checkpoint; offline it MUST be set from
    # the tokenizer or the reference's masked_scatter matches nothing and the
    # whole reference pipeline silently runs text-only (its own warning at
    # surya/common/surya/__init__.py:219 — asserted absent in the test)
    rec_model.config.image_token_id = processor.image_token_id
    rec_model = rec_model.to(torch.bfloat16)

    class OfflineRefRec(RefRec):
        def __init__(self, model, processor):
            self.model = model
            self.processor = processor
            self.kv_cache = None
            self.prompt_queue = deque()
            self.batch_prompt_mapping = None
            self.device_pad_token = torch.tensor(
                processor.pad_token_id, device=model.device, dtype=torch.long
            )

    class OfflineRefDet(RefDet):
        def __init__(self, model, processor):
            self.model = model
            self.processor = processor

    from surya_tpu.models.efficientvit import EfficientViTConfig

    size = EfficientViTConfig().image_size  # production processor size (h, w)
    det_proc = SegformerImageProcessor(size={"height": size[0], "width": size[1]})

    old_max = ref_settings.RECOGNITION_MAX_TOKENS
    ref_settings.RECOGNITION_MAX_TOKENS = MAX_TOKENS
    yield OfflineRefDet(det_model, det_proc), OfflineRefRec(rec_model, processor), rec_model, det_model
    ref_settings.RECOGNITION_MAX_TOKENS = old_max


@pytest.fixture(scope="module")
def my_pipeline(ref_pipeline):
    import jax.numpy as jnp

    from surya_tpu.common.weights import from_torch_state_dict
    from surya_tpu.detection import DetectionPredictor
    from surya_tpu.models import efficientvit, foundation
    from surya_tpu.recognition import RecognitionPredictor
    from surya_tpu.settings import settings

    _, _, rec_model, det_model = ref_pipeline

    det = DetectionPredictor()
    det.params = efficientvit.convert_torch(
        from_torch_state_dict(det_model.state_dict()), det.config
    )
    efficientvit.install_blob_detector(det)

    rec = RecognitionPredictor()
    params = foundation.convert_torch(
        from_torch_state_dict({k: v.float() for k, v in rec_model.state_dict().items()}),
        rec.config,
    )
    import jax

    # bf16 everywhere: the TPU compute regime (settings.MODEL_DTYPE below)
    rec.params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )

    old_max = settings.RECOGNITION_MAX_TOKENS
    old_dtype = settings.__dict__.get("MODEL_DTYPE")
    settings.RECOGNITION_MAX_TOKENS = MAX_TOKENS
    settings.__dict__["MODEL_DTYPE"] = jnp.bfloat16
    yield det, rec
    settings.RECOGNITION_MAX_TOKENS = old_max
    if old_dtype is None:
        settings.__dict__.pop("MODEL_DTYPE", None)
    else:
        settings.__dict__["MODEL_DTYPE"] = old_dtype


def test_full_page_pipeline_parity(ref_pipeline, my_pipeline):
    import warnings as warnings_mod

    ref_det, ref_rec, _, _ = ref_pipeline
    my_det, my_rec = my_pipeline
    page = _page()

    with warnings_mod.catch_warnings(record=True) as ref_warnings:
        warnings_mod.simplefilter("always")
        ref_out = ref_rec([page.copy()], det_predictor=ref_det)[0]
    # the reference silently degrades to a text-only forward when its
    # image-token scatter matches nothing — that makes this test vacuous
    scatter_warnings = [w for w in ref_warnings if "image tokens" in str(w.message)]
    assert not scatter_warnings, scatter_warnings[0].message

    my_out = my_rec([page.copy()], det_predictor=my_det)[0]

    ref_lines = ref_out.text_lines
    my_lines = my_out.text_lines
    assert len(my_lines) == len(ref_lines) > 0

    # detection polygons (line boxes) must match exactly in count and within
    # a pixel in position; bf16 decode trajectories must agree on text
    matched_text = 0
    for rl, ml in zip(ref_lines, my_lines):
        assert np.allclose(np.array(ml.polygon), np.array(rl.polygon), atol=1.5), (
            ml.polygon, rl.polygon,
        )
        if ml.text == rl.text:
            matched_text += 1
    # bf16 argmax can flip on near-ties with random weights; demand a
    # dominant match rather than bit-exactness
    assert matched_text >= max(1, int(0.75 * len(ref_lines))), (
        matched_text, len(ref_lines),
        [(ml.text, rl.text) for ml, rl in zip(my_lines, ref_lines)],
    )
