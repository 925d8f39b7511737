"""det->rec software pipeline (RECOGNITION_DET_PIPELINE_PAGES): page groups
recognized while the next group's detection runs in a worker thread must
produce exactly the results of the sequential path (reference semantics:
/root/reference/surya/recognition/__init__.py:773-942 — one detect pass, then
recognize; here the split into groups is invisible to the caller)."""

import numpy as np
import pytest
from PIL import Image, ImageDraw


def _pages(n):
    pages = []
    for p in range(n):
        img = Image.new("RGB", (640, 360), "white")
        d = ImageDraw.Draw(img)
        for i in range(3):
            d.text((20, 30 + i * 70), f"page {p} line {i} sample text", fill="black", font_size=24)
        pages.append(img)
    return pages


@pytest.fixture(scope="module")
def tiny_pipeline():
    from surya_tpu.detection import DetectionPredictor
    from surya_tpu.models import efficientvit
    from surya_tpu.recognition import RecognitionPredictor

    det = DetectionPredictor(tiny=True)
    efficientvit.install_blob_detector(det)
    rec = RecognitionPredictor(tiny=True)
    return det, rec


def _flatten(results):
    out = []
    for r in results:
        out.append(
            [
                (ln.text, tuple(np.asarray(ln.polygon).round(2).ravel().tolist()))
                for ln in r.text_lines
            ]
        )
    return out


def test_pipelined_matches_sequential(tiny_pipeline):
    from surya_tpu.settings import settings

    det, rec = tiny_pipeline
    pages = _pages(5)

    old_g = settings.RECOGNITION_DET_PIPELINE_PAGES
    old_max = settings.RECOGNITION_MAX_TOKENS
    settings.RECOGNITION_MAX_TOKENS = 8
    try:
        settings.RECOGNITION_DET_PIPELINE_PAGES = 0
        seq = rec([p.copy() for p in pages], det_predictor=det)
        settings.RECOGNITION_DET_PIPELINE_PAGES = 2
        piped = rec([p.copy() for p in pages], det_predictor=det)
    finally:
        settings.RECOGNITION_DET_PIPELINE_PAGES = old_g
        settings.RECOGNITION_MAX_TOKENS = old_max

    assert len(piped) == len(seq) == len(pages)
    assert _flatten(piped) == _flatten(seq)


def test_pipeline_empty_group(tiny_pipeline):
    """A page group in which detection finds nothing must yield empty
    OCRResults for its pages, not truncate the result list."""
    from surya_tpu.settings import settings

    det, rec = tiny_pipeline
    pages = _pages(3) + [Image.new("RGB", (640, 360), "white") for _ in range(2)]

    old_g = settings.RECOGNITION_DET_PIPELINE_PAGES
    old_max = settings.RECOGNITION_MAX_TOKENS
    settings.RECOGNITION_MAX_TOKENS = 8
    try:
        settings.RECOGNITION_DET_PIPELINE_PAGES = 3
        piped = rec([p.copy() for p in pages], det_predictor=det)
    finally:
        settings.RECOGNITION_DET_PIPELINE_PAGES = old_g
        settings.RECOGNITION_MAX_TOKENS = old_max

    assert len(piped) == len(pages)
    for r in piped[:3]:
        assert len(r.text_lines) > 0


def test_streaming_feeder_and_leftovers(tiny_pipeline):
    """prediction_loop with a feeder: later groups join the live run, and a
    prompt whose sequence bound exceeds the first-group-sized cache lands in
    the leftover sink (empty outputs in the main run)."""
    from surya_tpu.recognition import FEED_DONE
    from surya_tpu.settings import settings

    _, rec = tiny_pipeline
    rng = np.random.default_rng(0)
    small = (rng.random((20, 80, 3)) * 255).astype(np.float32)
    # tall+wide block: prompt bound must overflow the small-prompt cache
    big = (rng.random((600, 2000, 3)) * 255).astype(np.float32)

    img_size = rec.tasks["ocr_with_boxes"]["img_size"]
    est_small = rec.processor.prompt_len_bound(small.shape, img_size, "ocr_with_boxes", None, True)
    est_big = rec.processor.prompt_len_bound(big.shape, img_size, "ocr_with_boxes", None, True)
    bucket = next((b for b in rec.seq_buckets if b >= est_small), rec.seq_buckets[-1])
    cache_len = -(-(bucket + 8) // 256) * 256
    assert est_big + 8 > cache_len, (
        "test premise: the big slice must overflow the first-group cache "
        f"(est_big={est_big}, cache_len={cache_len})"
    )

    old_max = settings.RECOGNITION_MAX_TOKENS
    settings.RECOGNITION_MAX_TOKENS = 8
    try:
        flat1 = {"slices": [small], "input_text": [None], "task_names": ["ocr_with_boxes"]}
        flat2 = {
            "slices": [big, small.copy()],
            "input_text": [None, None],
            "task_names": ["ocr_with_boxes"] * 2,
        }
        state = {"sent": False}

        def feeder(block):
            if state["sent"]:
                return FEED_DONE
            state["sent"] = True
            return flat2

        leftovers = []
        toks, bbox_arr, scs = rec.prediction_loop(
            flat1, math_mode=True, feeder=feeder, leftover_sink=leftovers
        )
    finally:
        settings.RECOGNITION_MAX_TOKENS = old_max

    assert len(toks) == 3 == bbox_arr.shape[0]
    assert [p.id for p in leftovers] == [1]
    assert toks[1] == [] and len(toks[0]) > 0 and len(toks[2]) > 0


def test_streaming_call_splices_leftovers(tiny_pipeline, monkeypatch):
    """End-to-end streaming path with a leftover: results must equal the
    sequential path's line for line (the follow-up loop splices back by id)."""
    from surya_tpu.settings import settings

    _, rec = tiny_pipeline
    rng = np.random.default_rng(1)
    pages = [Image.new("RGB", (640, 360), "white") for _ in range(4)]
    poly = [[5, 5], [200, 5], [200, 40], [5, 40]]
    per_page = [
        [(rng.random((20, 80, 3)) * 255).astype(np.float32)],
        [(rng.random((20, 120, 3)) * 255).astype(np.float32)],
        [(rng.random((600, 2000, 3)) * 255).astype(np.float32)],  # leftover
        [(rng.random((20, 80, 3)) * 255).astype(np.float32)],
    ]
    page_idx = {id(p): i for i, p in enumerate(pages)}

    def fake_detect(images, task_names, det_predictor, detection_batch_size=None, highres_images=None):
        slices, smap, polys, tasks, texts, scales = [], [], [], [], [], []
        for img, task in zip(images, task_names):
            s = per_page[page_idx[id(img)]]
            smap.append(len(s))
            slices.extend(a.copy() for a in s)
            polys.extend([poly] * len(s))
            tasks.extend([task] * len(s))
            texts.extend([None] * len(s))
            scales.extend([(1, 1)] * len(s))
        return {
            "slices": slices, "slice_map": smap, "polygons": polys,
            "task_names": tasks, "input_text": texts, "res_scales": scales,
        }

    monkeypatch.setattr(rec, "detect_and_slice_bboxes", fake_detect)

    old_g, old_max = settings.RECOGNITION_DET_PIPELINE_PAGES, settings.RECOGNITION_MAX_TOKENS
    settings.RECOGNITION_MAX_TOKENS = 8
    try:
        settings.RECOGNITION_DET_PIPELINE_PAGES = 0
        seq = rec(pages, det_predictor=object())
        settings.RECOGNITION_DET_PIPELINE_PAGES = 2
        piped = rec(pages, det_predictor=object())
    finally:
        settings.RECOGNITION_DET_PIPELINE_PAGES = old_g
        settings.RECOGNITION_MAX_TOKENS = old_max

    assert _flatten(piped) == _flatten(seq)
    assert all(len(r.text_lines) == 1 for r in piped)


def test_stream_matches_batch(tiny_pipeline):
    """stream() must yield (index, OCRResult) in input order, each equal to
    the batch __call__ result for the same page — including from a generator
    input with a blank page mid-stream."""
    from surya_tpu.settings import settings

    det, rec = tiny_pipeline
    pages = _pages(4)
    pages.insert(2, Image.new("RGB", (640, 360), "white"))  # blank page

    old_max = settings.RECOGNITION_MAX_TOKENS
    old_g = settings.RECOGNITION_DET_PIPELINE_PAGES
    settings.RECOGNITION_MAX_TOKENS = 8
    try:
        settings.RECOGNITION_DET_PIPELINE_PAGES = 0
        batch = rec([p.copy() for p in pages], det_predictor=det)
        streamed = list(rec.stream((p.copy() for p in pages), det, group_pages=2))
    finally:
        settings.RECOGNITION_MAX_TOKENS = old_max
        settings.RECOGNITION_DET_PIPELINE_PAGES = old_g

    assert [i for i, _ in streamed] == list(range(len(pages)))
    assert _flatten([r for _, r in streamed]) == _flatten(batch)
    assert len(streamed[2][1].text_lines) == 0  # the blank page


def test_stream_mixed_task_leftovers(tiny_pipeline, monkeypatch):
    """A later-group task whose prompt bound exceeds the stream's cache bound
    routes to the leftover follow-up at stream end; in-order yielding and
    per-page results must survive."""
    from surya_tpu.settings import settings

    det, rec = tiny_pipeline
    rng = np.random.default_rng(3)
    pages = [Image.new("RGB", (640, 360), "white") for _ in range(4)]
    small = (rng.random((20, 80, 3)) * 255).astype(np.float32)
    big = (rng.random((600, 2000, 3)) * 255).astype(np.float32)
    per_page = [[small], [small.copy()], [big], [small.copy()]]
    poly = [[5, 5], [200, 5], [200, 40], [5, 40]]
    page_idx = {id(p): i for i, p in enumerate(pages)}

    def fake_detect(images, task_names, det_predictor, detection_batch_size=None, highres_images=None):
        slices, smap, polys, tasks, texts, scales = [], [], [], [], [], []
        for img, task in zip(images, task_names):
            s = per_page[page_idx[id(img)]]
            smap.append(len(s))
            slices.extend(a.copy() for a in s)
            polys.extend([poly] * len(s))
            tasks.extend([task] * len(s))
            texts.extend([None] * len(s))
            scales.extend([(1, 1)] * len(s))
        return {
            "slices": slices, "slice_map": smap, "polygons": polys,
            "task_names": tasks, "input_text": texts, "res_scales": scales,
        }

    monkeypatch.setattr(rec, "detect_and_slice_bboxes", fake_detect)

    old_max = settings.RECOGNITION_MAX_TOKENS
    settings.RECOGNITION_MAX_TOKENS = 8
    try:
        # force a small stream bound: pretend the task's budget image is tiny
        orig_bound = rec.processor.prompt_len_bound

        def patched_bound(shape, img_size, task, text, math_mode):
            if shape == (img_size[1], img_size[0], 3):
                return orig_bound(small.shape, img_size, task, text, math_mode)
            return orig_bound(shape, img_size, task, text, math_mode)

        monkeypatch.setattr(rec.processor, "prompt_len_bound", patched_bound)
        streamed = list(rec.stream(iter(pages), det, group_pages=2))
    finally:
        settings.RECOGNITION_MAX_TOKENS = old_max

    assert [i for i, _ in streamed] == [0, 1, 2, 3]
    assert all(len(r.text_lines) == 1 for _, r in streamed)
    assert all(isinstance(r.text_lines[0].text, str) for _, r in streamed)


def test_all_blank_pages_same_shape_both_paths(tiny_pipeline):
    """Zero detected lines still yields one empty OCRResult per page on BOTH
    the sequential and pipelined paths — the result list must never shrink
    below the page count (a caller zips results against input pages)."""
    from surya_tpu.settings import settings

    det, rec = tiny_pipeline
    pages = [Image.new("RGB", (640, 360), "white") for _ in range(3)]

    old_g = settings.RECOGNITION_DET_PIPELINE_PAGES
    try:
        settings.RECOGNITION_DET_PIPELINE_PAGES = 0
        seq = rec([p.copy() for p in pages], det_predictor=det)
        settings.RECOGNITION_DET_PIPELINE_PAGES = 2
        piped = rec([p.copy() for p in pages], det_predictor=det)
    finally:
        settings.RECOGNITION_DET_PIPELINE_PAGES = old_g

    assert len(seq) == len(piped) == len(pages)
    assert all(r.text_lines == [] for r in seq + piped)


def test_stream_error_yields_completed_pages(tiny_pipeline):
    """Failure semantics (README serving section): a mid-stream failure still
    yields every page that COMPLETED before it, in order and equal to the
    batch result, then surfaces the ORIGINAL exception to the consumer."""
    import threading

    from surya_tpu.settings import settings

    det, rec = tiny_pipeline
    pages = _pages(4)
    group1_consumed = threading.Event()
    calls = {"n": 0}

    class Boom(RuntimeError):
        pass

    class FailingDet:
        """Detects group 1 normally; group 2 raises — but only after the
        consumer has received group 1, so 'completed before the failure' is
        deterministic."""

        def __call__(self, images, batch_size=None):
            calls["n"] += 1
            if calls["n"] >= 2:
                group1_consumed.wait(60)
                raise Boom("detector died")
            return det(images, batch_size=batch_size)

    got = []
    old_max = settings.RECOGNITION_MAX_TOKENS
    settings.RECOGNITION_MAX_TOKENS = 8
    try:
        with pytest.raises(Boom):
            for i, res in rec.stream(iter(pages), FailingDet(), group_pages=2):
                got.append((i, res))
                if len(got) == 2:
                    group1_consumed.set()
        batch = rec([p.copy() for p in pages[:2]], det_predictor=det)
    finally:
        settings.RECOGNITION_MAX_TOKENS = old_max
        group1_consumed.set()

    assert [i for i, _ in got] == [0, 1]
    assert _flatten([r for _, r in got]) == _flatten(batch)


def test_stream_backpressure_bounds_buffer(tiny_pipeline):
    """An unbounded input with a slow consumer must not buffer unboundedly:
    the feeder stops pulling once finished-but-unconsumed pages reach
    RECOGNITION_STREAM_BUFFER_PAGES, and abandoning the generator stops the
    input pull at the next wave boundary."""
    import time

    from surya_tpu.settings import settings

    det, rec = tiny_pipeline
    template = _pages(1)[0]
    pulled = {"n": 0}

    def endless():
        while True:
            pulled["n"] += 1
            yield template.copy()

    old_max = settings.RECOGNITION_MAX_TOKENS
    old_buf = settings.RECOGNITION_STREAM_BUFFER_PAGES
    settings.RECOGNITION_MAX_TOKENS = 8
    settings.RECOGNITION_STREAM_BUFFER_PAGES = 3
    CONSUME, BUF = 3, 3
    try:
        stream = rec.stream(endless(), det, group_pages=1)
        got = [next(stream) for _ in range(CONSUME)]
        # bound: consumed + buffer + current group + one speculative
        # detection group (G=1 each), with one group of slack for the pull
        # that may be mid-flight when the check runs
        assert pulled["n"] <= CONSUME + BUF + 3, pulled["n"]
        stream.close()
        # the feeder sees the closed flag at the next wave boundary; after
        # the in-flight group settles, the input is never pulled again
        time.sleep(1.0)
        settled = pulled["n"]
        time.sleep(1.0)
        assert pulled["n"] == settled
    finally:
        settings.RECOGNITION_MAX_TOKENS = old_max
        settings.RECOGNITION_STREAM_BUFFER_PAGES = old_buf

    assert [i for i, _ in got] == list(range(CONSUME))
    assert all(len(r.text_lines) > 0 for _, r in got)
