"""Fuzzy text-overlap scoring (same definition as the reference's
benchmark/utils/scoring.py: best fuzzy match per predicted line, weighted by
sqrt reference length)."""

from __future__ import annotations

import math
from typing import List

from rapidfuzz import fuzz


def overlap_score(pred_lines: List[str], reference_lines: List[str]):
    line_scores, line_weights, line_match = [], [], {}
    for i, pred_line in enumerate(pred_lines):
        best, weight, match = 0.0, 1.0, None
        for j, ref_line in enumerate(reference_lines):
            score = fuzz.ratio(pred_line, ref_line, score_cutoff=20) / 100
            if score > best:
                best = score
                weight = math.sqrt(len(ref_line))
                match = j
        line_scores.append(best * weight)
        line_weights.append(weight)
        line_match[i] = match
    return line_scores, line_weights, line_match


def overlap_score_exact(pred_lines: List[str], reference_lines: List[str]):
    assert len(pred_lines) == len(reference_lines)
    line_scores, line_weights = [], []
    for pred_line, ref_line in zip(pred_lines, reference_lines):
        score = fuzz.ratio(pred_line, ref_line, score_cutoff=20) / 100
        weight = math.sqrt(len(ref_line))
        line_scores.append(score * weight)
        line_weights.append(weight)
    return line_scores, line_weights
