"""On-device connected components + per-component stats for detection.

Replaces the host CRAFT labeling pass (reference surya/detection/heatmap.py:
27-107 runs cv2.connectedComponentsWithStats on the full-page heatmap) with
an in-graph equivalent: threshold -> 4-connected min-label flooding by
alternating segmented min-scans along rows/columns inside lax.while_loop ->
segment-reduced component stats. Only [pages, max_comps, 11] stats cross
device->host (~KBs) instead of per-page heatmaps; the final CRAFT box
arithmetic (dilation margins, min-area rectangle) runs on host from the
stats (detection/heatmap.boxes_from_stats).

Everything here is deliberately gather-/sort-/scatter-free: log-shift scans
(pad+slice+min), cumsum, compares and segment reductions. The obvious
formulations - pointer jumping via take_along_axis, top_k root selection,
histogram segment_sums - each added minutes of XLA compile time on the TPU
backend (measured). Pages are processed batched with boundaries naturally
isolated (shifts never cross the page axis).
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


def _shift(x: jnp.ndarray, axis: int, offset: int, fill) -> jnp.ndarray:
    """x shifted by +offset along axis (element i reads i-offset), edge
    positions filled. Pure pad+slice — the cheapest data movement XLA has."""
    pads = [(0, 0)] * x.ndim
    if offset >= 0:
        pads[axis] = (offset, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, x.shape[axis])
    else:
        pads[axis] = (0, -offset)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(-offset, x.shape[axis] - offset)
    return jnp.pad(x, pads, constant_values=fill)[tuple(sl)]


def _run_min(lab: jnp.ndarray, mask: jnp.ndarray, axis: int, reverse: bool) -> jnp.ndarray:
    """Segmented min-scan along `axis`: each masked pixel receives the min
    label over its contiguous masked run so far (up to a break). Manual
    distance-doubling with pad/shift + min/where — log-depth vector ops with
    no gathers (TPU gathers serialize) and no associative_scan (its
    interleave/concat lowering made XLA compile times explode)."""
    n = lab.shape[axis]
    sign = -1 if reverse else 1
    m = jnp.where(mask, lab, _BIG)  # min over the run-clipped window so far
    c = mask  # window [i-2^k+1, i] entirely inside one run
    k = 1
    while k < n:
        m_s = _shift(m, axis, sign * k, _BIG)
        c_s = _shift(c, axis, sign * k, False)
        m = jnp.where(c, jnp.minimum(m, m_s), m)
        c = c & c_s
        k *= 2
    return m


def _min_flood(seed: jnp.ndarray, mask: jnp.ndarray, background) -> jnp.ndarray:
    """Flood the component-wise minimum of `seed` over 4-connected masked
    regions by alternating segmented min-scans along rows and columns until
    stable: each round floods whole runs in both directions, so rounds scale
    with a component's number of bends (tiny for CRAFT text blobs), not its
    pixel diameter. Unmasked pixels hold `background`."""

    def body(state):
        val, _ = state
        new = val
        new = jnp.minimum(new, _run_min(new, mask, 2, False))
        new = jnp.minimum(new, _run_min(new, mask, 2, True))
        new = jnp.minimum(new, _run_min(new, mask, 1, False))
        new = jnp.minimum(new, _run_min(new, mask, 1, True))
        new = jnp.where(mask, new, background)
        return new, jnp.any(new != val)

    def cond(state):
        return state[1]

    out, _ = jax.lax.while_loop(cond, body, (jnp.where(mask, seed, background), jnp.bool_(True)))
    return out


def label_components(mask: jnp.ndarray) -> jnp.ndarray:
    """Label 4-connected components of mask [P, H, W]. Returns int32
    [P, H, W]: 0 for background, else (flat index of the component's
    first row-major pixel) + 1 — the same enumeration order the reference's
    relabel pass produces."""
    P, H, W = mask.shape
    idx = (jnp.arange(H * W, dtype=jnp.int32) + 1).reshape(1, H, W)
    return _min_flood(jnp.broadcast_to(idx, mask.shape), mask, jnp.int32(0))


def component_stats(heat: jnp.ndarray, low_text: jnp.ndarray, max_comps: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Threshold heat [P, H, W] (float in [0,1]) at low_text (scalar or [P])
    and reduce per-component stats.

    Returns (stats [P, max_comps, STATS_DIM] float32, n_comp [P] int32,
    n_raw [P] int32). Components enumerate in row-major first-pixel order;
    pages with more than max_comps components keep the first max_comps —
    n_raw > max_comps tells the caller truncation happened (the detection
    predictor then reroutes those pages through the host path).

    Deliberately NOT jax.jit-wrapped: it is always called inside an outer
    jitted program, and a nested jit whose trace closes over outer tracers
    hits jax 0.9.0's separate_consts path (pjit.py:555 "must fall off the
    C++ dispatch fast path for correctness" TODO), which corrupts the outer
    program's dispatch: a later clean-state call supplies fewer buffers than
    the poisoned executable expects (INVALID_ARGUMENT "supplied 83 buffers
    but compiled program expected 86" — reproduced and bisected locally)."""
    P, H, W = heat.shape
    low = jnp.broadcast_to(jnp.asarray(low_text, jnp.float32), (P,))[:, None, None]
    mask = heat > low
    lab = label_components(mask)
    flat_lab = lab.reshape(P, H * W)
    flat_mask = mask.reshape(P, H * W)
    flat_heat = heat.reshape(P, H * W).astype(jnp.float32)

    # first-encounter roots: pixel i is a root iff its label == i+1. A cumsum
    # over the root indicator assigns each root its 1-based row-major
    # ordinal, and a second min-flood broadcasts the root's ordinal over its
    # component. No top_k / sort / searchsorted / gather anywhere — every
    # one of those made the TPU backend's compile time explode (a [P, HW]
    # take_along_axis alone took >9 minutes to compile)
    pix = jnp.arange(H * W, dtype=jnp.int32)[None, :]
    is_root = flat_mask & (flat_lab == pix + 1)
    ordinal = jnp.cumsum(is_root.astype(jnp.int32), axis=1)  # [P, HW]
    n_raw = ordinal[:, -1].astype(jnp.int32)
    n_comp = jnp.minimum(n_raw, max_comps)
    seed = jnp.where(is_root, ordinal, _BIG).reshape(P, H, W)
    comp = _min_flood(seed, mask, _BIG).reshape(P, H * W)
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
    return stats[:, 1:, :], n_comp, n_raw


def dynamic_threshold_inputs(heat: jnp.ndarray, valid_px=None) -> jnp.ndarray:
    """Top-10% mean intensity per page (reference heatmap.py:14-24 computes
    this on host; here it stays on device). heat [P, H, W] -> [P].

    Computed by bisecting the decile threshold (10 rounds of count-above,
    pure compares + reductions): top_k sorts and histogram segment-scatters
    both made first-compile time explode on the TPU backend. The mean is
    taken over the >=threshold set; ties within the final 2^-10 interval
    perturb it by <0.1% — far below the downstream threshold clamps.

    valid_px ([P] int, optional) is the number of REAL pixels per page when
    heat rows are zero-padded (chunk-count padding in the detection batch):
    the decile is k = valid_px//10, not a tenth of the padded array — else
    padding dilutes the threshold toward 0 and the scaling collapses."""
    P, H, W = heat.shape
    hw = H * W
    flat = heat.reshape(P, hw)
    if valid_px is None:
        k = jnp.full((P, 1), max(1, hw // 10), jnp.float32)
    else:
        k = jnp.maximum(jnp.asarray(valid_px, jnp.float32) // 10.0, 1.0)[:, None]

    lo = jnp.zeros((P, 1), jnp.float32)
    hi = jnp.ones((P, 1), jnp.float32)
    for _ in range(10):
        mid = (lo + hi) * 0.5
        cnt = (flat >= mid).sum(axis=1, keepdims=True)
        enough = cnt >= k
        lo = jnp.where(enough, mid, lo)
        hi = jnp.where(enough, hi, mid)
    sel = flat >= lo
    cnt = jnp.maximum(sel.sum(axis=1), 1).astype(jnp.float32)
    return (flat * sel).sum(axis=1) / cnt
