"""Differential CBS test: production segmenter vs an independent
exhaustive numpy oracle (VERDICT round-1 "missing #6": a second oracle so
CBS confidence doesn't rest on one golden fixture).

Both run in deterministic-threshold mode (CBSConfig.t_threshold), which
removes permutation randomness, so segment-for-segment EQUALITY is
demanded — recursion structure, exact breakpoint location (incl. tie
order), NA-run splitting, weighted-mean ratios, and the digits=4 rounding
are all pinned against an implementation that shares no machinery with
the device path (double loop over arcs vs padded cumsum scans)."""

import numpy as np
import pytest

from cbs_oracle import exec_cbs_oracle, max_arc_t
from wisecondorx_tpu.ops.cbs import (
    CBSConfig,
    _observed_stat,
    _segment_values,
    exec_cbs,
)


def _production_rows(results_r, results_w, gender, binsize, threshold):
    cfg = CBSConfig(t_threshold=threshold, exact_max=1 << 14)
    return exec_cbs(results_r, results_w, gender, binsize, cfg)


def test_max_t_matches_scan():
    """The oracle's double-loop max |T| == the device scan kernel's, on
    the full arc family (value and argmax, incl. the L-then-i tie order)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    for n in (7, 24, 61):
        y = rng.normal(0, 1, n)
        w = np.abs(rng.normal(1, 0.2, n))
        t_o, i_o, j_o = max_arc_t(y, w)
        n_pad = 8
        while n_pad < n:
            n_pad *= 2
        xp = np.zeros(n_pad)
        wp = np.zeros(n_pad)
        xp[:n] = y
        wp[:n] = w
        t_p, i_p, l_p = _observed_stat(
            jnp.asarray(xp), jnp.asarray(wp), jnp.int32(n),
            jnp.arange(n_pad, dtype=jnp.int32), 2,
        )
        assert abs(float(t_p) - t_o) < 1e-9 * max(1.0, t_o)
        assert (int(i_p), int(i_p) + int(l_p)) == (i_o, j_o)


@pytest.mark.parametrize("seed,threshold", [(3, 4.0), (11, 5.5), (29, 3.2)])
def test_segmentation_recursion_matches(seed, threshold):
    """Recursive split structure on one value vector must match exactly."""
    rng = np.random.default_rng(seed)
    n = 180
    y = rng.normal(0, 1, n)
    y[40:80] += 2.2
    y[120:128] -= 3.0
    w = np.abs(rng.normal(1, 0.15, n))
    cfg = CBSConfig(t_threshold=threshold, exact_max=1 << 14)
    prod = _segment_values(y, w, cfg, (0, 0))
    oracle = [
        (lo, hi)
        for lo, hi in __import__("cbs_oracle").segment_values(
            y, w, threshold
        )
    ]
    assert prod == oracle


@pytest.mark.parametrize("gender", ["F", "M"])
def test_full_pipeline_differential(gender):
    """exec_cbs == the oracle end-to-end on a randomized multi-chromosome
    case with blacklisted (zero) bins, long NA runs, zero weights, and an
    all-NA chromosome."""
    rng = np.random.default_rng(7 if gender == "F" else 13)
    n_chr = 24 if gender == "M" else 23
    binsize = 100_000  # NA-run split threshold = 20 bins
    results_r, results_w = [], []
    for c in range(n_chr):
        n = int(rng.integers(40, 140))
        y = rng.normal(0, 0.25, n)
        if c % 3 == 0:
            y[10:16] += 1.4  # plant an event
        if c == 5:
            y[:] = 0.0  # all-blacklisted chromosome -> dropped
        y[2:5] = 0.0  # short blacklist run (no split)
        if n > 70:
            y[30:55] = 0.0  # 25-bin NA run -> segment split
        w = np.abs(rng.normal(1, 0.2, n))
        w[7] = 0.0  # zero weight -> 1.0 rule
        results_r.append(y)
        results_w.append(w)

    threshold = 5.0
    prod = _production_rows(results_r, results_w, gender, binsize, threshold)
    oracle = exec_cbs_oracle(
        results_r, results_w, gender, binsize, threshold
    )
    assert prod == oracle
    assert len(prod) > n_chr  # the battery actually split something


def test_threshold_mode_is_deterministic():
    rng = np.random.default_rng(5)
    y = rng.normal(0, 0.3, 90)
    y[20:50] += 1.0
    r = [y] + [np.zeros(8)] * 22
    w = [np.ones(90)] + [np.ones(8)] * 22
    # Planted |T| = 1.0 * sqrt(30*60/90) ~= 4.47; threshold 4.0 splits it.
    a = _production_rows(r, w, "F", 100_000, 4.0)
    b = _production_rows(r, w, "F", 100_000, 4.0)
    assert a == b and len(a) >= 3
