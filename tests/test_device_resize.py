"""The composed LANCZOS weight matrices must reproduce PIL's double resize
(thumbnail + stretch, reference surya/detection/__init__.py:50-62) to within
fixed-point/intermediate-rounding tolerance (PIL quantizes coefficients and
rounds to uint8 between stages; the matrix path composes in float)."""

import numpy as np
from PIL import Image

from surya_tpu.detection.resize import double_resize_matrices, pil_thumbnail_size


def _pil_double(arr: np.ndarray, dst_wh) -> np.ndarray:
    img = Image.fromarray(arr)
    img.thumbnail(dst_wh, Image.Resampling.LANCZOS)
    return np.asarray(img.resize(dst_wh, Image.Resampling.LANCZOS), np.float64)


def _matrix_double(arr: np.ndarray, dst_wh) -> np.ndarray:
    V, H = double_resize_matrices(arr.shape[:2], (dst_wh[1], dst_wh[0]))
    h, w, c = arr.shape
    # BLAS matmuls, not einsum loops (this test dominated suite wall-clock)
    out = (V.astype(np.float64) @ arr.reshape(h, w * c).astype(np.float64)).reshape(-1, w, c)
    out = np.tensordot(out, H.astype(np.float64), axes=([1], [1])).transpose(0, 2, 1)
    return np.clip(np.round(out), 0, 255)


def _structured(h, w, seed):
    """Document-like content: smooth background + lines + noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 200 + 40 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
    base[(yy % 40) < 8] = 30  # dark "text lines"
    base = base + rng.normal(0, 10, (h, w))
    return np.clip(base, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)


CASES = [
    ((896, 1240), (896, 896)),   # typical page chunk: mild downscale + stretch
    ((1400, 1000), (896, 896)),  # tall chunk
    ((2200, 1800), (896, 896)),  # large page -> reduce() pre-step kicks in (scale > 2)
    ((600, 500), (896, 896)),    # upscale both axes (thumbnail no-op)
    ((896, 896), (896, 896)),    # identity
    ((123, 1111), (896, 896)),   # extreme aspect
]


def test_matches_pil_double_resize():
    for i, ((h, w), dst) in enumerate(CASES):
        arr = _structured(h, w, i)
        ref = _pil_double(arr, dst)
        mine = _matrix_double(arr, dst)
        assert mine.shape == ref.shape
        diff = np.abs(mine - ref)
        assert diff.mean() < 0.6, ((h, w), diff.mean())
        # intermediate uint8 rounding can shift isolated pixels a few levels
        assert np.percentile(diff, 99.5) <= 3, ((h, w), np.percentile(diff, 99.5))


def test_thumbnail_size_matches_pil():
    for (h, w), dst in CASES:
        img = Image.fromarray(np.zeros((h, w, 3), np.uint8))
        img.thumbnail(dst, Image.Resampling.LANCZOS)
        assert pil_thumbnail_size((w, h), dst) == img.size, (w, h)


def test_rows_are_stochastic():
    V, H = double_resize_matrices((1400, 1000), (896, 896))
    np.testing.assert_allclose(V.sum(1), 1.0, atol=1e-5)
    np.testing.assert_allclose(H.sum(1), 1.0, atol=1e-5)
