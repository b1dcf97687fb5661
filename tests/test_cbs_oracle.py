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


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_extreme_weight_skews_differential(seed):
    """Weighted path under weight skews spanning six decades, including
    near-zero weights at segment boundaries and heavy weights inside NA
    runs — segment-for-segment equality vs the oracle (VERDICT r3
    next-step #5)."""
    rng = np.random.default_rng(seed)
    n = 140
    y = rng.normal(0, 1, n)
    y[30:70] += 1.8
    w = 10.0 ** rng.uniform(-3, 3, n)  # 1e-3 .. 1e3
    w[29:31] = 1e-3  # vanishing weight at the breakpoint
    w[69:71] = 1e3   # huge weight at the other breakpoint
    threshold = 4.0
    cfg = CBSConfig(t_threshold=threshold, exact_max=1 << 14)
    prod = _segment_values(y, w, cfg)
    oracle = __import__("cbs_oracle").segment_values(y, w, threshold)
    assert prod == oracle


def test_na_run_weight_interaction_differential():
    """Zero-ratio (NA) runs longer than the split threshold interacting
    with zero weights (the 1^-99==1.0 quirk) and skewed weights around
    run edges: full-pipeline equality vs the oracle."""
    rng = np.random.default_rng(55)
    binsize = 100_000  # na_run threshold = 20 bins
    n = 160
    results_r = []
    results_w = []
    for c in range(23):
        r = np.exp(rng.normal(0, 0.1, n))
        w = 10.0 ** rng.uniform(-2, 2, n)
        if c == 2:
            r[40:70] = 0.0   # 30-bin NA run -> must split
            w[40:70] = 0.0   # zero weights -> 1.0 via the R typo quirk
            w[39] = 1e2
            w[70] = 1e-2
        if c == 5:
            r[10:25] = 0.0   # 15-bin run -> must NOT split
        results_r.append(r)
        results_w.append(w)
    threshold = 5.0
    prod = _production_rows(results_r, results_w, "F", binsize, threshold)
    oracle = exec_cbs_oracle(results_r, results_w, "F", binsize, threshold)
    assert prod == oracle


def _oracle_perm_p(y, w, n_perms, seed, min_width=2):
    """Independent Monte-Carlo p-value of the weighted max-arc statistic:
    plain numpy permutations of the (y, w) PAIRS scored with the
    exhaustive double-loop statistic — no shared machinery with the
    engine's fused device rounds."""
    obs, _, _ = max_arc_t(y, w, min_width)
    rng = np.random.default_rng(seed)
    hits = 0
    for _ in range(n_perms):
        order = rng.permutation(len(y))
        t, _, _ = max_arc_t(y[order], w[order], min_width)
        if t >= obs:
            hits += 1
    return (hits + 1) / (n_perms + 1)


@pytest.mark.parametrize("delta,expect_split", [(4.0, True), (0.0, False)])
def test_weighted_permutation_decision_matches_oracle(delta, expect_split):
    """The engine's weighted Monte-Carlo split decision agrees with an
    independent numpy permutation oracle when the oracle's p sits far
    from alpha (near-boundary decisions are genuinely random for any
    Monte-Carlo test and are excluded by construction)."""
    rng = np.random.default_rng(31)
    n = 44
    y = rng.normal(0, 1, n)
    y[12:26] += delta
    w = 10.0 ** rng.uniform(-1.5, 1.5, n)
    alpha = 0.01
    p = _oracle_perm_p(y, w, 1500, seed=9)
    if expect_split:
        assert p < alpha / 3, f"fixture not clearly significant (p={p})"
    else:
        assert p > alpha * 3, f"fixture unexpectedly significant (p={p})"

    cfg = CBSConfig(alpha=alpha, nperm=2000, seed=5, exact_max=1 << 14)
    segments = _segment_values(y, w, cfg)
    split = len(segments) > 1
    assert split == expect_split


def test_weighted_null_alpha_calibration():
    """False-positive rate of the engine's weighted permutation test on
    null data stays near alpha: split fraction over many weighted-null
    trials must be within Monte-Carlo noise of alpha=0.05 (one-sided
    binomial 99.9% bounds for 120 trials: [0.004, 0.13])."""
    from wisecondorx_tpu.ops.cbs import _segment_jobs

    rng = np.random.default_rng(77)
    trials = 120
    jobs = []
    for _ in range(trials):
        y = rng.normal(0, 1, 60)
        w = 10.0 ** rng.uniform(-1, 1, 60)
        jobs.append((y, w))
    cfg = CBSConfig(alpha=0.05, nperm=400, seed=3, exact_max=1 << 14)
    results = _segment_jobs(jobs, cfg)
    frac = np.mean([len(r) > 1 for r in results])
    assert 0.004 <= frac <= 0.13, f"split fraction {frac} far from alpha"
