"""On-device connected components vs a pure-numpy BFS oracle."""

import numpy as np

from surya_tpu.ops import connected_components as cc


def _bfs_components(mask: np.ndarray):
    """4-connected components, enumerated by first row-major pixel."""
    H, W = mask.shape
    seen = np.zeros_like(mask, bool)
    comps = []
    for y in range(H):
        for x in range(W):
            if not mask[y, x] or seen[y, x]:
                continue
            stack = [(y, x)]
            seen[y, x] = True
            pix = []
            while stack:
                cy, cx = stack.pop()
                pix.append((cy, cx))
                for ny, nx in ((cy + 1, cx), (cy - 1, cx), (cy, cx + 1), (cy, cx - 1)):
                    if 0 <= ny < H and 0 <= nx < W and mask[ny, nx] and not seen[ny, nx]:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            comps.append(pix)
    return comps


def _check(heat: np.ndarray, low: float, max_comps=64):
    import jax.numpy as jnp

    stats, n_comp, n_raw = cc.component_stats(jnp.asarray(heat[None]), low, max_comps=max_comps)
    assert int(np.asarray(n_raw)[0]) >= int(np.asarray(n_comp)[0])
    stats, n_comp = np.asarray(stats)[0], int(np.asarray(n_comp)[0])
    comps = _bfs_components(heat > low)
    assert n_comp == min(len(comps), max_comps), (n_comp, len(comps))
    for i, pix in enumerate(comps[:max_comps]):
        ys = np.array([p[0] for p in pix], np.float64)
        xs = np.array([p[1] for p in pix], np.float64)
        s = stats[i]
        assert s[cc.AREA] == len(pix)
        assert s[cc.MIN_X] == xs.min() and s[cc.MAX_X] == xs.max()
        assert s[cc.MIN_Y] == ys.min() and s[cc.MAX_Y] == ys.max()
        vals = heat[[p[0] for p in pix], [p[1] for p in pix]]
        assert abs(s[cc.MAX_VAL] - vals.max()) < 1e-6
        assert abs(s[cc.SUM_X] - xs.sum()) < 1e-3 * max(1, abs(xs.sum()))
        assert abs(s[cc.SUM_XY] - (xs * ys).sum()) < 1e-3 * max(1, abs((xs * ys).sum()))


def test_blobs_and_snakes():
    heat = np.zeros((64, 96), np.float32)
    heat[5:12, 10:80] = 0.9         # wide line
    heat[20:24, 5:9] = 0.7          # small blob
    heat[30, 5:90] = 0.8            # 1px snake
    heat[40:60, 40] = 0.8           # vertical snake
    # L-shaped component (tests label merging around a corner)
    heat[50:62, 70:73] = 0.85
    heat[59:62, 60:73] = 0.85
    _check(heat, 0.35)


def test_diagonal_not_connected():
    heat = np.zeros((16, 16), np.float32)
    heat[2, 2] = 1.0
    heat[3, 3] = 1.0  # diagonal only: 4-connectivity keeps them separate
    _check(heat, 0.5)


def test_random_noise_matches_oracle():
    rng = np.random.default_rng(0)
    for seed in range(4):
        heat = rng.uniform(0, 1, (48, 48)).astype(np.float32)
        _check(heat, 0.62, max_comps=512)


def test_batched_pages_are_isolated():
    import jax.numpy as jnp

    heat = np.zeros((2, 8, 8), np.float32)
    heat[0, 0:8, 3] = 1.0  # vertical line touching page edge
    heat[1, 0, :] = 1.0    # would merge with page 0's line if axes leaked
    stats, n, _ = cc.component_stats(jnp.asarray(heat), 0.5, max_comps=8)
    n = np.asarray(n)
    assert n[0] == 1 and n[1] == 1
    s0, s1 = np.asarray(stats)[0, 0], np.asarray(stats)[1, 0]
    assert s0[cc.AREA] == 8 and s1[cc.AREA] == 8


def test_overflow_keeps_first_components():
    heat = np.zeros((8, 33), np.float32)
    for i in range(16):
        heat[2, i * 2] = 1.0  # 16 isolated pixels
    import jax.numpy as jnp

    stats, n, n_raw = cc.component_stats(jnp.asarray(heat[None]), 0.5, max_comps=4)
    assert int(np.asarray(n_raw)[0]) == 16
    assert int(np.asarray(n)[0]) == 4
    np.testing.assert_array_equal(np.asarray(stats)[0, :, cc.MIN_X], [0, 2, 4, 6])


def test_dynamic_threshold_inputs():
    import jax.numpy as jnp

    heat = np.zeros((1, 10, 10), np.float32)
    heat[0, 0] = 1.0  # 10 pixels of 1.0 = exactly the top 10%
    top10 = np.asarray(cc.dynamic_threshold_inputs(jnp.asarray(heat)))
    assert abs(top10[0] - 1.0) < 1e-6


def test_dynamic_threshold_ignores_padding():
    """Zero-padded rows (chunk-count padding in batched pages) must not
    dilute the decile: with valid_px given, a half-padded page produces the
    same top-10% mean as the unpadded page alone."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    real = rng.uniform(0, 1, (1, 10, 10)).astype(np.float32)
    padded = np.concatenate([real, np.zeros_like(real)], axis=1)  # [1, 20, 10]
    t_real = np.asarray(cc.dynamic_threshold_inputs(jnp.asarray(real)))
    t_pad = np.asarray(cc.dynamic_threshold_inputs(jnp.asarray(padded), np.array([100])))
    assert abs(t_real[0] - t_pad[0]) < 2e-3, (t_real, t_pad)
