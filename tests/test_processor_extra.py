"""Extra coverage: recognition processor image handling + detection line path."""

import numpy as np


def _processor():
    from surya_tpu.recognition.processor import RecognitionProcessor
    from surya_tpu.recognition.tokenizer import OCRTokenizer

    return RecognitionProcessor(OCRTokenizer())


def test_scale_to_fit():
    proc = _processor()
    big = np.zeros((1000, 2000, 3), np.float32)
    out = proc.scale_to_fit(big, (1024, 256))
    assert out.shape[0] * out.shape[1] <= 1024 * 256
    small = np.zeros((20, 40, 3), np.float32)
    out = proc.scale_to_fit(small, (1024, 256))
    assert out.shape[0] * out.shape[1] >= 168 * 168
    mid = np.zeros((100, 500, 3), np.float32)
    assert proc.scale_to_fit(mid, (1024, 256)).shape == mid.shape


def test_tile_image_grid():
    proc = _processor()
    img = np.random.default_rng(0).uniform(0, 255, (40, 100, 3)).astype(np.float32)
    patches, grid = proc.tile_image(img)
    assert grid == (4, 8)  # 56x112 after rounding to factor 28
    assert patches.shape == (32, 588)
    assert patches.dtype == np.uint8


def test_align_long_axis():
    proc = _processor()
    tall = np.zeros((100, 40, 3), np.float32)
    out, rotated = proc.align_long_axis(tall)
    assert rotated and out.shape[:2] == (40, 100)
    wide = np.zeros((40, 100, 3), np.float32)
    _, rotated = proc.align_long_axis(wide)
    assert not rotated


def test_build_prompt_ids_layout():
    proc = _processor()
    ids = proc.build_prompt_ids("ocr_with_boxes", 5, "hi", math_mode=False)
    assert ids[:5] == [proc.image_token_id] * 5
    assert ids[5:9] == proc.register_token_ids
    assert ids[9] == proc.bos_token_id["ocr_with_boxes"]
    assert ids[10] == proc.nomath_token
    assert ids[-1] == proc.eoi_token_id


def test_parallel_get_lines():
    from surya_tpu.detection.heatmap import parallel_get_lines

    heat = np.zeros((200, 200), np.float32)
    heat[50:70, 20:180] = 0.9
    aff = np.zeros((200, 200), np.float32)
    aff[20:180, 100:103] = 1.0
    result = parallel_get_lines((heat, aff), (400, 400), include_maps=True)
    assert len(result.bboxes) == 1
    assert result.heatmap.size == (200, 200)
    assert all(line.vertical for line in result.vertical_lines)


def test_render_html():
    from surya_tpu.debug.render_html import render_text_html

    html = render_text_html([[10, 10, 200, 40]], ["hello <b>world</b>"], (400, 300))
    assert "hello &lt;b&gt;world&lt;/b&gt;" in html  # plain text is escaped
    assert "width: 400px" in html and "katex" in html


def test_prompt_len_bound_covers_actual():
    """prompt_len_bound must upper-bound the prompt build_prefill_batch
    actually constructs (the scheduler sizes the KV cache from it; an
    underestimate would overflow the cache) while staying tight enough
    that a typical line lands in a small seq bucket."""
    import math

    proc = _processor()
    rng = np.random.default_rng(1)
    shapes = [(32, 565), (9, 2000), (400, 3000), (168, 168), (1, 1), (300, 90), (256, 1024)]
    task = "ocr_with_boxes"
    max_size = (1024, 256)
    for h, w in shapes:
        for text in (None, "hello <math>x^2</math> world"):
            for math_mode in (True, False):
                crop = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
                bound = proc.prompt_len_bound((h, w), max_size, task, text, math_mode)
                prepared = proc.scale_to_fit(crop, max_size)
                patches, grid = proc.tile_image(prepared)
                n_tok = grid[0] * grid[1] // (proc.merge_size**2)
                ids = proc.build_prompt_ids(task, n_tok, text or "", math_mode)
                assert len(ids) <= bound, (h, w, text, math_mode, len(ids), bound)
                assert bound <= len(ids) + 4  # tight: only the ROT/NO-MATH slack

    # a typical detected line fits the smallest default bucket
    line_bound = proc.prompt_len_bound((32, 565), max_size, task, None, True)
    assert line_bound <= 128
