"""Checkpoint path tests: torch safetensors dir -> config parse -> conversion
-> orbax converted-param cache roundtrip (nothing else exercises the
real-checkpoint code path since downloads are unavailable here)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture()
def detection_checkpoint(tmp_path):
    import sys

    sys.path.insert(0, "/root/reference")
    from safetensors.torch import save_file

    from surya.detection.model.config import EfficientViTConfig as TorchCfg
    from surya.detection.model.encoderdecoder import EfficientViTForSemanticSegmentation

    torch.manual_seed(0)
    cfg = TorchCfg()
    cfg.num_labels = 2
    model = EfficientViTForSemanticSegmentation(cfg).eval()
    ckpt = tmp_path / "det_ckpt"
    ckpt.mkdir()
    save_file(model.state_dict(), str(ckpt / "model.safetensors"))
    (ckpt / "config.json").write_text(
        json.dumps({"num_classes": 2, "image_size": {"height": 896, "width": 896}})
    )
    return ckpt, model


def test_detection_checkpoint_load_and_cache(detection_checkpoint):
    ckpt, model = detection_checkpoint
    from surya_tpu.common import checkpoint as ckpt_cache
    from surya_tpu.detection.loader import load_detection_model

    params, config = load_detection_model(str(ckpt))
    assert config.image_size == (896, 896)
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    assert n > 30_000_000  # full-size conversion happened

    # second load must come from the orbax cache (delete the safetensors to prove it)
    (ckpt / "model.safetensors").unlink()
    params2, _ = load_detection_model(str(ckpt))
    a = __import__("jax").tree.leaves(params)[0]
    b = __import__("jax").tree.leaves(params2)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_converted_cache_roundtrip(tmp_path):
    import jax.numpy as jnp

    from surya_tpu.common import checkpoint as cc

    params = {"layer": {"kernel": jnp.arange(12.0).reshape(3, 4), "bias": jnp.ones(4)}}
    cc.save_converted(params, str(tmp_path), "test")
    restored = cc.load_converted(str(tmp_path), "test")
    assert restored is not None
    assert np.allclose(np.asarray(restored["layer"]["kernel"]), np.arange(12).reshape(3, 4))
    assert cc.load_converted(str(tmp_path), "missing") is None
