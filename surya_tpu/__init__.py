"""surya-tpu: a TPU-native (JAX/XLA/Pallas) document OCR framework.

Capabilities (mirroring the reference surya toolkit, re-designed TPU-first):
  - text line detection (EfficientViT semantic segmentation)
  - text recognition / OCR in 90+ languages + LaTeX OCR (ViT encoder +
    autoregressive decoder with on-device continuous batching)
  - layout analysis + reading order (Swin encoder + autoregressive box decoder)
  - table structure recognition
  - OCR error detection (DistilBERT classifier)
"""

__version__ = "0.1.0"
