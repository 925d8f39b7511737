"""On-device detection postprocess (component stats -> host box math) vs the
host CRAFT path (native C++ / OpenCV on full-res maps) on synthetic pages.

Exact parity is impossible — the device path labels at head resolution (1/4)
while the host path labels the bilinear-upsampled full-res map — so boxes
are compared by IoU and edge distance."""

import numpy as np
import pytest
from PIL import Image, ImageDraw

from surya_tpu.settings import settings


def _bbox_iou(a, b):
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua else 0.0


@pytest.fixture(scope="module")
def blob_detector():
    """Detection predictor whose heatmap is a perfect line detector driven by
    input darkness (same hook the bench uses) — random weights can't produce
    coherent maps."""
    from surya_tpu.detection import DetectionPredictor
    from surya_tpu.models import efficientvit

    det = DetectionPredictor(tiny=True)
    efficientvit.install_blob_detector(det)
    return det


def _page(lines=8, width=1000, height=800, rotate=0.0):
    img = Image.new("RGB", (width, height), "white")
    draw = ImageDraw.Draw(img)
    for i in range(lines):
        draw.text((60, 40 + i * 80), f"Line {i}: some benchmark text here.", fill="black", font_size=28)
    if rotate:
        img = img.rotate(rotate, expand=False, fillcolor="white")
    return img


def _run(det, images, on_device: bool):
    old = settings.DETECTOR_ON_DEVICE_POSTPROCESS
    settings.DETECTOR_ON_DEVICE_POSTPROCESS = on_device
    try:
        return det(images)
    finally:
        settings.DETECTOR_ON_DEVICE_POSTPROCESS = old


def _compare(host_res, dev_res, min_iou=0.8, max_extra=1):
    h_boxes = [b.bbox for b in host_res.bboxes]
    d_boxes = [b.bbox for b in dev_res.bboxes]
    assert abs(len(h_boxes) - len(d_boxes)) <= max_extra, (len(h_boxes), len(d_boxes))
    matched = 0
    for hb in h_boxes:
        best = max((_bbox_iou(hb, db) for db in d_boxes), default=0.0)
        if best >= min_iou:
            matched += 1
    assert matched >= len(h_boxes) - max_extra, (matched, len(h_boxes))


def test_axis_aligned_pages_match_host_path(blob_detector):
    pages = [_page(), _page(lines=5, width=700, height=600)]
    host = _run(blob_detector, pages, on_device=False)
    dev = _run(blob_detector, pages, on_device=True)
    for h, d in zip(host, dev):
        assert len(h.bboxes) > 0
        _compare(h, d)


def test_tall_page_merges_across_chunks(blob_detector):
    # a 2000px page splits into chunks; a line exactly on the seam must come
    # back as ONE box on both paths
    img = Image.new("RGB", (900, 2000), "white")
    draw = ImageDraw.Draw(img)
    for y in (300, 893, 1500):  # 893 straddles the 896 chunk seam
        draw.rectangle((100, y - 9, 800, y + 9), fill="black")
    host = _run(blob_detector, [img], on_device=False)[0]
    dev = _run(blob_detector, [img], on_device=True)[0]
    assert len(host.bboxes) == 3, [b.bbox for b in host.bboxes]
    assert len(dev.bboxes) == 3, [b.bbox for b in dev.bboxes]
    _compare(host, dev, max_extra=0)


def test_rotated_page(blob_detector):
    pages = [_page(rotate=3.0)]
    host = _run(blob_detector, pages, on_device=False)[0]
    dev = _run(blob_detector, pages, on_device=True)[0]
    assert len(host.bboxes) > 0
    # rotated quads come from the moments estimate: looser IoU
    _compare(host, dev, min_iou=0.6, max_extra=2)


def test_component_overflow_reroutes_to_host(blob_detector):
    """More components than DETECTOR_MAX_COMPONENTS: the batch must fall
    back to the host path (no silently dropped boxes) without permanently
    disabling the stats path."""
    pages = [_page(lines=6)]
    host = _run(blob_detector, pages, on_device=False)[0]
    old = settings.DETECTOR_MAX_COMPONENTS
    settings.DETECTOR_MAX_COMPONENTS = 3  # force overflow
    try:
        dev = _run(blob_detector, pages, on_device=True)[0]
    finally:
        settings.DETECTOR_MAX_COMPONENTS = old
    assert blob_detector._stats_skip == 0
    assert len(dev.bboxes) == len(host.bboxes) > 3
    _compare(host, dev, max_extra=0)


def test_mixed_chunk_counts_in_one_batch(blob_detector):
    """A 1-chunk page batched with a 3-chunk page: the padded page-map slots
    must not dilute the dynamic threshold (regression for the valid_px fix) —
    both pages must match their host-path boxes."""
    short = Image.new("RGB", (900, 800), "white")
    tall = Image.new("RGB", (900, 2000), "white")
    ds, dt = ImageDraw.Draw(short), ImageDraw.Draw(tall)
    for y in range(60, 760, 120):
        ds.rectangle((80, y, 700, y + 16), fill="black")
    for y in range(60, 1950, 120):
        dt.rectangle((80, y, 700, y + 16), fill="black")
    host = _run(blob_detector, [short, tall], on_device=False)
    dev = _run(blob_detector, [short, tall], on_device=True)
    for h, d in zip(host, dev):
        assert len(h.bboxes) > 0
        _compare(h, d, max_extra=0)


def test_transient_failure_recovers(blob_detector):
    """An injected one-shot backend failure must route STATS_RETRY_AFTER
    batches to the host path and then RETRY the device path (VERDICT r2:
    the old sticky flag downgraded the predictor for the process life)."""
    page = _page(lines=4)
    orig = blob_detector._forward_stats
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected transient backend failure")
        return orig(*args, **kwargs)

    blob_detector._forward_stats = flaky
    blob_detector.STATS_RETRY_AFTER = 2  # instance override, shadows the class
    try:
        r1 = _run(blob_detector, [page], on_device=True)[0]  # fails -> host
        assert blob_detector._stats_skip == 2
        assert len(r1.bboxes) > 0  # host fallback still produced boxes
        _run(blob_detector, [page], on_device=True)
        _run(blob_detector, [page], on_device=True)
        assert calls["n"] == 1  # backoff batches never touched the device path
        assert blob_detector._stats_skip == 0
        r4 = _run(blob_detector, [page], on_device=True)[0]  # device path again
        assert calls["n"] == 2
        assert blob_detector._stats_skip == 0
        assert blob_detector._stats_backoff is None  # success resets backoff
        _compare(r1, r4)
    finally:
        blob_detector._forward_stats = orig
        del blob_detector.STATS_RETRY_AFTER
        blob_detector._stats_skip = 0
        blob_detector._stats_backoff = None


def test_persistent_failure_backs_off_exponentially(blob_detector):
    """Consecutive failures double the host-path window (a permanently-broken
    device path must not re-pay the failed forward every N batches forever),
    capped at STATS_RETRY_MAX."""
    page = _page(lines=4)
    orig = blob_detector._forward_stats

    def always_fail(*args, **kwargs):
        raise RuntimeError("injected persistent backend failure")

    blob_detector._forward_stats = always_fail
    blob_detector.STATS_RETRY_AFTER = 2
    blob_detector.STATS_RETRY_MAX = 8
    try:
        _run(blob_detector, [page], on_device=True)  # fail #1
        assert (blob_detector._stats_skip, blob_detector._stats_backoff) == (2, 4)
        blob_detector._stats_skip = 0  # fast-forward the skip window
        _run(blob_detector, [page], on_device=True)  # fail #2
        assert (blob_detector._stats_skip, blob_detector._stats_backoff) == (4, 8)
        blob_detector._stats_skip = 0
        _run(blob_detector, [page], on_device=True)  # fail #3: capped
        assert (blob_detector._stats_skip, blob_detector._stats_backoff) == (8, 8)
    finally:
        blob_detector._forward_stats = orig
        del blob_detector.STATS_RETRY_AFTER
        del blob_detector.STATS_RETRY_MAX
        blob_detector._stats_skip = 0
        blob_detector._stats_backoff = None


def test_grayscale_ship_matches_rgb(blob_detector):
    """The single-channel H2D fast path (device resize broadcasts gray->RGB
    after the channel-wise-linear resize) must produce EXACTLY the boxes of
    the 3-channel ship for grayscale content, and color content must route
    to the 3-channel program untouched."""
    pages = [_page(), _page(lines=5, width=700, height=600)]
    color = _page()
    from PIL import ImageDraw

    ImageDraw.Draw(color).rectangle((100, 100, 300, 200), fill=(200, 40, 40))

    old_resize = settings.DETECTOR_DEVICE_RESIZE
    old_gray = settings.DETECTOR_GRAYSCALE_SHIP
    settings.DETECTOR_DEVICE_RESIZE = True
    try:
        settings.DETECTOR_GRAYSCALE_SHIP = None  # auto: gray content ships C=1
        gray_res = _run(blob_detector, pages, on_device=True)
        color_res = _run(blob_detector, [color], on_device=True)
        settings.DETECTOR_GRAYSCALE_SHIP = False  # always C=3
        rgb_res = _run(blob_detector, pages, on_device=True)
    finally:
        settings.DETECTOR_DEVICE_RESIZE = old_resize
        settings.DETECTOR_GRAYSCALE_SHIP = old_gray

    for g, r in zip(gray_res, rgb_res):
        assert [b.bbox for b in g.bboxes] == [b.bbox for b in r.bboxes]
        assert len(g.bboxes) > 0
    assert len(color_res[0].bboxes) > 0
