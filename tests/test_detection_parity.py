"""Numeric parity of the JAX detection model vs the reference torch model.

Instantiates the reference EfficientViTForSemanticSegmentation with random
(but BN-perturbed) weights, converts the state dict with
surya_tpu.models.efficientvit.convert_torch, and compares full forward
outputs. Validates both the architecture transcription and the weight
converter at once.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def torch_model():
    from surya.detection.model.config import EfficientViTConfig as TorchCfg
    from surya.detection.model.encoderdecoder import EfficientViTForSemanticSegmentation

    torch.manual_seed(0)
    cfg = TorchCfg()
    cfg.num_labels = 2
    model = EfficientViTForSemanticSegmentation(cfg).eval()
    # randomize BN stats so the fold is actually exercised
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.02)
                mod.running_var.uniform_(0.7, 1.3)
                mod.weight.normal_(1.0, 0.05)
                mod.bias.normal_(0, 0.02)
    return model


def test_forward_parity(torch_model):
    import jax
    from surya_tpu.common.weights import from_torch_state_dict
    from surya_tpu.models import efficientvit as ev

    size = 224
    cfg = ev.EfficientViTConfig(image_size=(size, size))
    params = ev.convert_torch(from_torch_state_dict(torch_model.state_dict()), cfg)

    rng = np.random.default_rng(0)
    img = rng.random((1, size, size, 3), dtype=np.float32)

    # reference: ImageNet-normalize, forward, sigmoid (in model), upsample
    mean = np.array(ev.IMAGENET_MEAN, np.float32)
    std = np.array(ev.IMAGENET_STD, np.float32)
    timg = torch.from_numpy(((img - mean) / std).transpose(0, 3, 1, 2))
    with torch.no_grad():
        tout = torch_model(pixel_values=timg).logits
        tout = torch.nn.functional.interpolate(tout, size=(size, size), mode="bilinear", align_corners=False)
    tout = tout.numpy().transpose(0, 2, 3, 1)

    jout = np.asarray(jax.jit(lambda p, x: ev.apply(p, cfg, x))(params, img))

    assert jout.shape == tout.shape
    diff = np.abs(jout - tout).max()
    assert diff < 2e-4, f"max abs diff {diff}"
