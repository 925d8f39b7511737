"""Unit tests for host utilities not covered elsewhere: vertical-line
detection, word assembly, polygon dedup, box utils, slicer joins."""

import numpy as np


def test_vertical_lines_detection():
    from surya_tpu.detection.affinity import get_vertical_lines

    # affinity map with two vertical bars
    amap = np.zeros((200, 200), np.float32)
    amap[20:180, 60:63] = 1.0
    amap[20:180, 140:143] = 1.0
    lines = get_vertical_lines(amap, (200, 200), (400, 400))
    assert len(lines) >= 1
    for line in lines:
        assert line.vertical
        assert line.bbox[2] - line.bbox[0] <= 40  # thin


def test_words_from_chars():
    from surya_tpu.common.polygon import PolygonBox
    from surya_tpu.recognition.schema import TextChar
    from surya_tpu.recognition.util import words_from_chars

    def char(text, x):
        return TextChar(text=text, polygon=[x, 0, x + 10, 10], confidence=0.9)

    chars = [char("h", 0), char("i", 10), char(" ", 20), char("y", 30), char("o", 40)]
    line = PolygonBox(polygon=[0, 0, 50, 10])
    words = words_from_chars(chars, line)
    assert [w.text for w in words] == ["hi", "yo"]
    assert words[0].bbox[0] == 0  # merged left to line start


def test_clean_close_polygons():
    from surya_tpu.recognition.util import clean_close_polygons

    a = [[0, 0], [10, 0], [10, 10], [0, 10]]
    b = [[0.05, 0], [10.05, 0], [10.05, 10], [0.05, 10]]  # within thresh
    c = [[20, 0], [30, 0], [30, 10], [20, 10]]
    assert len(clean_close_polygons([a, b, c])) == 2


def test_clean_boxes_containment():
    from surya_tpu.common.polygon import PolygonBox
    from surya_tpu.common.util import clean_boxes

    outer = PolygonBox(polygon=[0, 0, 100, 100])
    inner = PolygonBox(polygon=[10, 10, 50, 50])
    degenerate = PolygonBox(polygon=[5, 5, 5, 20])
    kept = clean_boxes([outer, inner, degenerate])
    assert kept == [outer]


def test_slicer_join_merges_across_tiles():
    from surya_tpu.layout.schema import LayoutBox, LayoutResult
    from surya_tpu.layout.slicer import ImageSlicer

    slicer = ImageSlicer({"height": 1500, "width": 1500}, {"height": 1200, "width": 1200})
    # one figure split across a vertical cut at y=1200
    top = LayoutResult(
        bboxes=[LayoutBox(polygon=[100, 1000, 500, 1200], label="Figure", position=0)],
        image_bbox=[0, 0, 800, 1200],
    )
    bottom = LayoutResult(
        bboxes=[LayoutBox(polygon=[100, 0, 500, 150], label="Figure", position=0)],
        image_bbox=[0, 0, 800, 1100],
    )
    joined = slicer.join([top, bottom], [(0, 0, 0), (0, 0, 1)])
    assert len(joined) == 1
    assert joined[0].sliced
    assert len(joined[0].bboxes) == 1  # merged into one figure
    assert joined[0].bboxes[0].bbox[3] >= 1300


def test_polygon_box_ops():
    from surya_tpu.common.polygon import PolygonBox

    box = PolygonBox(polygon=[10, 10, 30, 20])
    assert box.width == 20 and box.height == 10 and box.area == 200
    assert box.center == [20, 15]
    other = PolygonBox(polygon=[20, 10, 40, 20])
    assert box.intersection_pct(other) == 0.5
    box.expand(0.1, 0.1)
    assert box.bbox[0] == 8 and box.bbox[2] == 32
    box.clamp([0, 0, 25, 25])
    assert box.bbox[2] == 25


def test_reap_stale_caches(tmp_path):
    """Only the current fingerprint dir plus the `keep` most recent siblings
    survive; non-cache dirs and files are untouched."""
    import os
    import time as _time

    from surya_tpu.common.runtime import _reap_stale_caches

    current = tmp_path / "jax_cache-current"
    current.mkdir()
    for i in range(5):
        d = tmp_path / f"jax_cache-old{i}"
        d.mkdir()
        t = _time.time() - (5 - i) * 3600
        os.utime(d, (t, t))
    other = tmp_path / "models"
    other.mkdir()

    _reap_stale_caches(current, keep=2)

    kept = sorted(p.name for p in tmp_path.iterdir())
    # newest two siblings (old3, old4) + current + unrelated dir survive
    assert kept == ["jax_cache-current", "jax_cache-old3", "jax_cache-old4", "models"]


def test_reap_ranks_by_newest_file_inside(tmp_path):
    """A read-only (all-hits) cache never updates its dir mtime — recency must
    come from the newest file INSIDE, so an actively-used sibling survives."""
    import os
    import time as _time

    from surya_tpu.common.runtime import _reap_stale_caches

    current = tmp_path / "jax_cache-current"
    current.mkdir()
    now = _time.time()
    active = tmp_path / "jax_cache-active"  # old dir mtime, fresh file inside
    active.mkdir()
    (active / "entry-cache").write_bytes(b"x")
    os.utime(active, (now - 9000, now - 9000))
    for i in range(3):
        d = tmp_path / f"jax_cache-idle{i}"
        d.mkdir()
        t = now - (i + 1) * 3600
        os.utime(d, (t, t))

    _reap_stale_caches(current, keep=1)

    kept = sorted(p.name for p in tmp_path.iterdir())
    assert kept == ["jax_cache-active", "jax_cache-current"]


def test_atomic_cache_put(tmp_path, monkeypatch):
    """setup_jax patches jax's LRUCache.put to write temp+rename: the cache
    dir never contains a partially-written entry file (a kill mid-write used
    to leave a truncated artifact that poisoned every later process)."""
    from surya_tpu.common import runtime
    from jax._src import lru_cache as _lru

    runtime._patch_atomic_cache_writes()
    assert getattr(_lru.LRUCache, "_surya_atomic", False)

    cache = _lru.LRUCache(str(tmp_path), max_size=-1)
    seen_partial = []
    orig_write_bytes = type(tmp_path).write_bytes

    def spy_write_bytes(self, data):
        # at the moment any file is being written, the FINAL entry name must
        # not exist yet (writes only ever target .tmp-* names)
        if (tmp_path / "k-cache").exists() and "tmp-" in self.name:
            seen_partial.append(self.name)
        assert self.name != "k-cache", "entry written in place (non-atomic)"
        return orig_write_bytes(self, data)

    monkeypatch.setattr(type(tmp_path), "write_bytes", spy_write_bytes)
    cache.put("k", b"payload")
    monkeypatch.undo()

    assert cache.get("k") == b"payload"
    assert (tmp_path / "k-cache").read_bytes() == b"payload"
    assert not list(tmp_path.glob("*.tmp-*"))  # no temp litter
    # idempotent on existing key (original contract)
    cache.put("k", b"different")
    assert cache.get("k") == b"payload"


def test_note_execution_failure_gating(tmp_path, monkeypatch):
    """Cache invalidation triggers immediately on artifact-specific phrasings
    but only on the SECOND generic INVALID_ARGUMENT (transient relay blips
    must not wipe GBs of XLA artifacts — ADVICE r3)."""
    from surya_tpu.common import runtime

    wipes = []
    monkeypatch.setattr(runtime, "invalidate_compilation_cache", lambda: wipes.append(1))
    monkeypatch.setattr(runtime, "_failure_count", 0)

    assert not runtime.note_execution_failure("RESOURCE_EXHAUSTED: oom donating buffers")
    assert not runtime.note_execution_failure("INVALID_ARGUMENT: TPU backend error")
    assert wipes == []
    assert runtime.note_execution_failure("INVALID_ARGUMENT: TPU backend error")
    assert wipes == [1]
    # artifact-specific phrasing wipes immediately, first time
    monkeypatch.setattr(runtime, "_failure_count", 0)
    assert runtime.note_execution_failure(
        RuntimeError("Execution supplied 83 buffers but compiled program expected 86")
    )
    assert wipes == [1, 1]


def test_bucket_rows_and_gray_ship():
    """BasePredictor.bucket_rows: power-of-two buckets <= batch_size, mesh-
    aligned, never below `current`. gray_ship: R==G==B batches drop to one
    channel; color batches pass through untouched (strided gate)."""
    import numpy as np

    from surya_tpu.common.predictor import BasePredictor

    p = BasePredictor.__new__(BasePredictor)  # no model load
    p.mesh = None
    assert p.bucket_rows(1, 16) == 1
    assert p.bucket_rows(3, 16) == 4
    assert p.bucket_rows(8, 16) == 8
    assert p.bucket_rows(9, 16) == 16
    assert p.bucket_rows(16, 16) == 16
    # current beyond batch_size must still fit (exact rows)
    assert p.bucket_rows(20, 16) == 20

    class FakeMesh:
        shape = {"data": 4}

    p.mesh = FakeMesh()
    from surya_tpu.settings import settings

    old = settings.MESH_DATA_AXIS
    settings.MESH_DATA_AXIS = "data"
    try:
        assert p.bucket_rows(3, 16) % 4 == 0
    finally:
        settings.MESH_DATA_AXIS = old

    gray = np.full((2, 40, 40, 3), 7, np.uint8)
    out = BasePredictor.gray_ship(gray)
    assert out.shape == (2, 40, 40, 1) and (out[..., 0] == 7).all()

    color = gray.copy()
    color[1, 33, 33, 2] = 9  # differs OFF the strided sample grid
    out = BasePredictor.gray_ship(color)
    assert out.shape == (2, 40, 40, 3)  # full compare catches it

    already_one = np.zeros((2, 40, 40, 1), np.uint8)
    assert BasePredictor.gray_ship(already_one) is already_one
