"""On-device connected components + per-component stats for detection.

Replaces the host CRAFT labeling pass (reference surya/detection/heatmap.py:
27-107 runs cv2.connectedComponentsWithStats on the full-page heatmap) with
an in-graph equivalent: threshold -> 4-connected min-index label propagation
with pointer jumping inside lax.while_loop -> segment-reduced component
stats. Only [pages, max_comps, 10] stats cross device->host (~KBs) instead
of per-page heatmaps; the final CRAFT box arithmetic (dilation margins,
min-area rectangle) runs on host from the stats
(detection/heatmap.boxes_from_stats).

Labeling converges in O(log diameter) pointer-jumping rounds, not O(path
length): each round takes one neighborhood min then two label-of-label
gathers. Everything is static-shape; pages are processed batched with
boundaries naturally isolated (shifts never cross the page axis).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# stats layout along the last axis
AREA, MIN_X, MAX_X, MIN_Y, MAX_Y, MAX_VAL, SUM_X, SUM_Y, SUM_XX, SUM_YY, SUM_XY = range(11)
STATS_DIM = 11


def _neighbor_min(lab: jnp.ndarray, mask: jnp.ndarray, big: jnp.ndarray) -> jnp.ndarray:
    """4-neighborhood minimum over positive labels. lab [P, H, W]."""
    lp = jnp.where(mask, lab, big)
    m = lp
    m = jnp.minimum(m, jnp.pad(lp[:, 1:, :], ((0, 0), (0, 1), (0, 0)), constant_values=2**30))
    m = jnp.minimum(m, jnp.pad(lp[:, :-1, :], ((0, 0), (1, 0), (0, 0)), constant_values=2**30))
    m = jnp.minimum(m, jnp.pad(lp[:, :, 1:], ((0, 0), (0, 0), (0, 1)), constant_values=2**30))
    m = jnp.minimum(m, jnp.pad(lp[:, :, :-1], ((0, 0), (0, 0), (1, 0)), constant_values=2**30))
    return jnp.where(mask, m, 0)


def label_components(mask: jnp.ndarray) -> jnp.ndarray:
    """Label 4-connected components of mask [P, H, W]. Returns int32
    [P, H, W]: 0 for background, else (flat index of the component's
    first row-major pixel) + 1 — the same enumeration order the reference's
    relabel pass produces."""
    P, H, W = mask.shape
    big = jnp.int32(H * W + 2)
    idx = (jnp.arange(H * W, dtype=jnp.int32) + 1).reshape(1, H, W)
    lab0 = jnp.where(mask, idx, 0)

    def jump(lab_flat):
        # L[p] <- L[L[p] - 1]  (labels are flat-index+1)
        return jnp.where(
            lab_flat > 0,
            jnp.take_along_axis(lab_flat, jnp.maximum(lab_flat - 1, 0), axis=1),
            0,
        )

    def body(state):
        lab, _ = state
        new = _neighbor_min(lab, mask, big)
        flat = new.reshape(P, H * W)
        flat = jump(jump(flat))
        new = flat.reshape(P, H, W)
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True)))
    return lab


@partial(jax.jit, static_argnames=("max_comps",))
def component_stats(heat: jnp.ndarray, low_text: jnp.ndarray, max_comps: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Threshold heat [P, H, W] (float in [0,1]) at low_text (scalar or [P])
    and reduce per-component stats.

    Returns (stats [P, max_comps, STATS_DIM] float32, n_comp [P] int32).
    Components enumerate in row-major first-pixel order; pages with more
    than max_comps components keep the first max_comps."""
    P, H, W = heat.shape
    low = jnp.broadcast_to(jnp.asarray(low_text, jnp.float32), (P,))[:, None, None]
    mask = heat > low
    lab = label_components(mask)
    flat_lab = lab.reshape(P, H * W)
    flat_mask = mask.reshape(P, H * W)
    flat_heat = heat.reshape(P, H * W).astype(jnp.float32)

    # first-encounter roots: pixel i is a root iff its label == i+1
    pix = jnp.arange(H * W, dtype=jnp.int32)[None, :]
    is_root = flat_mask & (flat_lab == pix + 1)
    # top_k over descending (HW - i) picks the smallest root indices first
    score = jnp.where(is_root, H * W - pix, 0)
    root_score, root_pix = jax.lax.top_k(score, max_comps)  # [P, C]
    root_valid = root_score > 0
    roots = jnp.where(root_valid, H * W - root_score, H * W + 5)  # flat index, ascending
    roots = jnp.sort(roots, axis=1)
    n_comp = root_valid.sum(axis=1).astype(jnp.int32)

    # map each pixel's label -> component id (1-based; 0 = background/overflow)
    pos = jax.vmap(jnp.searchsorted)(roots, flat_lab - 1)  # [P, HW]
    pos = jnp.clip(pos, 0, max_comps - 1)
    hit = flat_mask & (jnp.take_along_axis(roots, pos, axis=1) == flat_lab - 1)
    seg = jnp.where(hit, pos + 1, 0)

    xs = (jnp.arange(H * W, dtype=jnp.int32) % W).astype(jnp.float32)[None, :]
    ys = (jnp.arange(H * W, dtype=jnp.int32) // W).astype(jnp.float32)[None, :]
    one = flat_mask.astype(jnp.float32)

    n_seg = max_comps + 1

    def page_stats(seg_p, heat_p, one_p, xs_p, ys_p):
        ssum = lambda v: jax.ops.segment_sum(v, seg_p, num_segments=n_seg)
        smax = lambda v: jax.ops.segment_max(v, seg_p, num_segments=n_seg)
        smin = lambda v: jax.ops.segment_min(v, seg_p, num_segments=n_seg)
        area = ssum(one_p)
        return jnp.stack(
            [
                area,
                smin(jnp.where(one_p > 0, xs_p, jnp.inf)),
                smax(jnp.where(one_p > 0, xs_p, -jnp.inf)),
                smin(jnp.where(one_p > 0, ys_p, jnp.inf)),
                smax(jnp.where(one_p > 0, ys_p, -jnp.inf)),
                smax(jnp.where(one_p > 0, heat_p, -jnp.inf)),
                ssum(xs_p * one_p),
                ssum(ys_p * one_p),
                ssum(xs_p * xs_p * one_p),
                ssum(ys_p * ys_p * one_p),
                ssum(xs_p * ys_p * one_p),
            ],
            axis=-1,
        )

    xs_b = jnp.broadcast_to(xs, (P, H * W))
    ys_b = jnp.broadcast_to(ys, (P, H * W))
    stats = jax.vmap(page_stats)(seg, flat_heat, one, xs_b, ys_b)  # [P, C+1, STATS_DIM]
    return stats[:, 1:, :], n_comp


def dynamic_threshold_inputs(heat: jnp.ndarray) -> jnp.ndarray:
    """Top-10% mean intensity per page (reference heatmap.py:14-24 computes
    this on host; here it stays on device). heat [P, H, W] -> [P]."""
    P, H, W = heat.shape
    k = max(1, (H * W) // 10)
    top, _ = jax.lax.top_k(heat.reshape(P, H * W), k)
    return top.mean(axis=1)
