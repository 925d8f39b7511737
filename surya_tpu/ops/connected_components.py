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


_BIG = jnp.int32(1 << 30)


def _run_min(lab: jnp.ndarray, mask: jnp.ndarray, axis: int, reverse: bool) -> jnp.ndarray:
    """Segmented min-scan along `axis`: each masked pixel receives the min
    label over its contiguous masked run so far. Classic (value, reset)
    associative operator — log-depth vector ops, no gathers (TPU gathers
    lower to serial dynamic-slices and dominated the old pointer-jumping
    formulation)."""
    v = jnp.where(mask, lab, _BIG)
    r = ~mask

    def comb(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    out, _ = jax.lax.associative_scan(comb, (v, r), axis=axis, reverse=reverse)
    return out


def label_components(mask: jnp.ndarray) -> jnp.ndarray:
    """Label 4-connected components of mask [P, H, W]. Returns int32
    [P, H, W]: 0 for background, else (flat index of the component's
    first row-major pixel) + 1 — the same enumeration order the reference's
    relabel pass produces.

    Min labels propagate by alternating segmented min-scans along rows and
    columns until stable: each round floods whole runs in both directions,
    so rounds scale with a component's number of bends (tiny for CRAFT text
    blobs), not its pixel diameter."""
    P, H, W = mask.shape
    idx = (jnp.arange(H * W, dtype=jnp.int32) + 1).reshape(1, H, W)
    lab0 = jnp.where(mask, idx, 0)

    def body(state):
        lab, _ = state
        new = lab
        new = jnp.minimum(new, _run_min(new, mask, 2, False))
        new = jnp.minimum(new, _run_min(new, mask, 2, True))
        new = jnp.minimum(new, _run_min(new, mask, 1, False))
        new = jnp.minimum(new, _run_min(new, mask, 1, True))
        new = jnp.where(mask, new, 0)
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

    # first-encounter roots: pixel i is a root iff its label == i+1. A cumsum
    # over the root indicator assigns each root its 1-based row-major ordinal,
    # and one gather reads every pixel's ordinal at its root — no top_k /
    # sort / searchsorted (those dominated this program's device time)
    pix = jnp.arange(H * W, dtype=jnp.int32)[None, :]
    is_root = flat_mask & (flat_lab == pix + 1)
    ordinal = jnp.cumsum(is_root.astype(jnp.int32), axis=1)  # [P, HW]
    n_comp = jnp.minimum(ordinal[:, -1], max_comps).astype(jnp.int32)
    comp = jnp.take_along_axis(ordinal, jnp.maximum(flat_lab - 1, 0), axis=1)
    # 1-based component id; 0 = background / beyond-max_comps overflow
    seg = jnp.where(flat_mask & (comp <= max_comps), comp, 0)

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
    this on host; here it stays on device). heat [P, H, W] -> [P].

    Computed from a 256-bin histogram instead of a top_k over the full map:
    bins fully inside the top decile contribute their exact value sums, the
    one straddling bin is approximated by its center (error < 1/256 of one
    decile share — far below the downstream threshold clamps)."""
    P, H, W = heat.shape
    hw = H * W
    k = max(1, hw // 10)
    flat = heat.reshape(P, hw)
    bins = jnp.clip((flat * 256.0).astype(jnp.int32), 0, 255)

    ones = jnp.ones_like(flat)
    cnt = jax.vmap(lambda b, o: jax.ops.segment_sum(o, b, num_segments=256))(bins, ones)
    val = jax.vmap(lambda b, v: jax.ops.segment_sum(v, b, num_segments=256))(bins, flat)

    cnt_rev, val_rev = cnt[:, ::-1], val[:, ::-1]  # brightest bin first
    above = jnp.cumsum(cnt_rev, axis=1) - cnt_rev  # pixels in brighter bins
    take = jnp.clip(k - above, 0.0, cnt_rev)  # pixels taken from each bin
    center = (jnp.arange(255, -1, -1, dtype=jnp.float32) + 0.5) / 256.0
    contrib = jnp.where(take >= cnt_rev, val_rev, take * center[None, :])
    return contrib.sum(axis=1) / k
