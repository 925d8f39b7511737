"""Tokenizer parity vs the reference InnerOCRTokenizer
(surya/common/surya/processor/tokenizer.py:27-227) plus pinned golden ids.

Both sides get the same special-token table and the same stand-in math
tokenizer (the checkpoint's Qwen BPE is not reachable offline), so every id
must match exactly: regex precedence (system -> math tags -> math BPE ->
formatting -> UTF-16), html unescaping, offset arithmetic, and the
three-regime decode segmentation."""

import sys

import pytest

sys.path.insert(0, "/root/reference")

from surya_tpu.recognition.tokenizer import (  # noqa: E402
    DEFAULT_SPECIAL_TOKENS,
    ByteFallbackMathTokenizer,
    OCRTokenizer,
    TaskNames,
)


class FakeQwen:
    """Minimal Qwen2Tokenizer stand-in with the reference's call surface."""

    def __init__(self):
        self._inner = ByteFallbackMathTokenizer()

    def __len__(self):
        return len(self._inner)

    def __call__(self, text):
        return {"input_ids": self._inner.encode(text)}

    def decode(self, ids):
        return self._inner.decode(ids)


CORPUS = [
    "",
    "Hello, World!",
    "The quick brown fox jumps over 12345 lazy dogs.",
    "naïve café — déjà vu",
    "日本語のテキストと中文文本",
    "مرحبا بالعالم",
    "emoji: 😀🎉 and beyond the BMP 𝕏",
    "<b>bold</b> and <i>italic</i> and <u>under</u>",
    "nested <b><i>both</i></b> tags",
    "<math>x^2 + y_1 = \\frac{a}{b}</math>",
    '<math display="inline">e^{i\\pi}</math> inline',
    '<math display="block">\\sum_{k=0}^n k</math>',
    "text before <math>a+b</math> text after",
    "two <math>x</math> blocks <math>y</math> here",
    "formatting inside math <math>a<b>c</math> stays math",
    "entity &lt;b&gt; unescapes to a format tag",
    "amp &amp; semi &semi; mixed",
    "</S> system token <PAD> inline <NOP>",
    "<br>line<br>breaks",
    "<sup>2</sup><sub>i</sub><mark>hl</mark><del>gone</del>",
    "mixed: ascii 日本語 <b>tag</b> <math>x+1</math> 😀 &lt;i&gt;",
]

@pytest.fixture(scope="module")
def reference_tok():
    from surya.common.surya.processor.tokenizer import InnerOCRTokenizer

    return InnerOCRTokenizer(special_tokens=DEFAULT_SPECIAL_TOKENS, qwen_tokenizer=FakeQwen())


@pytest.fixture(scope="module")
def my_tok():
    return OCRTokenizer(special_tokens=DEFAULT_SPECIAL_TOKENS)


def test_encode_parity(reference_tok, my_tok):
    for text in CORPUS:
        ref = reference_tok._tokenize(text)
        mine = my_tok.encode(text, task=TaskNames.ocr_with_boxes)
        assert mine == ref, f"encode mismatch for {text!r}: {mine} != {ref}"


def test_decode_parity(reference_tok, my_tok):
    for text in CORPUS:
        ids = reference_tok._tokenize(text)
        ref = reference_tok.decode(list(ids))
        mine = my_tok.decode(list(ids), task=TaskNames.ocr_with_boxes)
        assert mine == ref, f"decode mismatch for {text!r}: {mine!r} != {ref!r}"


def test_offsets_match(reference_tok, my_tok):
    assert my_tok.qwen_offset == reference_tok.qwen_token_offset
    assert my_tok.SPECIAL_TOKEN_MAPPING == reference_tok.SPECIAL_TOKEN_MAPPING
    assert (
        my_tok.special_token_offset
        == reference_tok.qwen_token_offset + reference_tok.SPECIAL_TOKEN_OFFSET
    )


def test_block_task_is_pure_math_tokenizer(my_tok):
    # reference SuryaOCRTokenizer._tokenize routes block task to qwen BPE
    text = "\\frac{1}{2} + x"
    assert my_tok.encode(text, task=TaskNames.block_without_boxes) == ByteFallbackMathTokenizer().encode(text)
    ids = my_tok.encode(text, task=TaskNames.block_without_boxes)
    assert my_tok.decode(ids, task=TaskNames.block_without_boxes) == text


def test_golden_ids(my_tok):
    """Regression-pin the offline id layout for a few strings (qwen_offset
    256; specials follow; UTF-16 units at 256+33)."""
    off = my_tok.special_token_offset
    assert off == 256 + 33
    assert my_tok.encode("Hi", task=TaskNames.ocr_with_boxes) == [off + ord("H"), off + ord("i")]
    math_open = my_tok.SPECIAL_TOKEN_MAPPING["<math>"]
    math_close = my_tok.SPECIAL_TOKEN_MAPPING["</math>"]
    assert my_tok.encode("<math>x</math>", task=TaskNames.ocr_with_boxes) == [
        math_open, ord("x"), math_close
    ]
    b_open = my_tok.SPECIAL_TOKEN_MAPPING["<b>"]
    b_close = my_tok.SPECIAL_TOKEN_MAPPING["</b>"]
    assert my_tok.encode("<b>a</b>", task=TaskNames.ocr_with_boxes) == [
        b_open, off + ord("a"), b_close
    ]
    # surrogate pair: one astral char -> two UTF-16 units
    ids = my_tok.encode("😀", task=TaskNames.ocr_with_boxes)
    assert len(ids) == 2 and all(i >= off for i in ids)
    assert my_tok.decode(ids, task=TaskNames.ocr_with_boxes) == "😀"
