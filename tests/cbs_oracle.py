"""Independent CBS oracle for differential testing.

A from-scratch, plain-numpy, exhaustive implementation of the weighted
circular-binary-segmentation semantics the production segmenter
(wisecondorx_tpu/ops/cbs.py) implements on device — written directly from
DNAcopy's statistic definition and the reference's post-processing script
(/root/reference/src/wisecondorx/include/CBS.R:35-130), with none of the
production code's machinery: no arc-length scan, no padding buckets, no
cumsum slicing — just a double loop over every circular arc.

Both implementations are deterministic given the same split-acceptance
threshold (CBSConfig.t_threshold), so the differential test in
test_cbs_oracle.py can demand segment-for-segment equality on randomized
inputs; the permutation p-value itself is validated statistically by
test_cbs_battery.py.
"""

from __future__ import annotations

import numpy as np


def max_arc_t(y: np.ndarray, w: np.ndarray, min_width: int = 2):
    """Exhaustive max |T| over circular arcs (i, j], each side >= min_width.

    T = (X1/W1 - X0/W0) / sqrt(1/W1 + 1/W0) with X/W the arc's weighted
    value / weight sums.  Returns (max_t, i, j) with the production's tie
    order: shortest arc first, then smallest start.
    """
    n = len(y)
    best, best_i, best_j = -np.inf, 0, 0
    w_tot = float(np.sum(w))
    x_tot = float(np.sum(w * y))
    for length in range(min_width, n - min_width + 1):
        for i in range(0, n - length + 1):
            w1 = float(np.sum(w[i : i + length]))
            x1 = float(np.sum((w * y)[i : i + length]))
            w0 = w_tot - w1
            x0 = x_tot - x1
            t = abs(
                (x1 / w1 - x0 / w0) / np.sqrt(1.0 / w1 + 1.0 / w0)
            )
            if t > best:
                best, best_i, best_j = t, i, i + length
    return best, best_i, best_j


def segment_values(y: np.ndarray, w: np.ndarray, threshold: float,
                   min_width: int = 2):
    """Recursive segmentation of one chromosome's non-NA values.

    A segment splits at the max-|T| arc iff max |T| >= threshold.
    Returns sorted (lo, hi) half-open ranges.
    """
    final = []
    stack = [(0, len(y))]
    while stack:
        lo, hi = stack.pop()
        n = hi - lo
        if n < 2 * min_width:
            final.append((lo, hi))
            continue
        t, i, j = max_arc_t(y[lo:hi], w[lo:hi], min_width)
        if not np.isfinite(t) or t <= 0 or t < threshold:
            final.append((lo, hi))
            continue
        for p in ((lo, lo + i), (lo + i, lo + j), (lo + j, hi)):
            if p[1] > p[0]:
                stack.append(p)
    return sorted(final)


def exec_cbs_oracle(results_r, results_w, ref_gender, binsize, threshold,
                    min_width: int = 2):
    """Full CBS.R-equivalent pipeline with threshold-based splitting.

    Returns rows [chr0, start, end, ratio] (0-based half-open, ratios
    rounded to 4 decimals), the contract of ops.cbs.exec_cbs.
    """
    n_chr = 24 if ref_gender == "M" else 23
    na_run = int(2e6 / binsize)  # CBS.R:95
    rows = []
    for c in range(n_chr):
        y = np.asarray(results_r[c], dtype=np.float64).copy()
        w = np.asarray(results_w[c], dtype=np.float64).copy()
        y[y == 0] = np.nan  # CBS.R:41
        w[w == 0] = 1.0  # CBS.R:42 (1^-99 is literally 1.0)
        keep = ~np.isnan(y)
        if not keep.any():
            continue  # CBS.R:56-63
        pos = np.nonzero(keep)[0]
        for lo, hi in segment_values(y[keep], w[keep], threshold, min_width):
            # 1-based inclusive endpoints on the full chromosome.
            s1, e1 = int(pos[lo]) + 1, int(pos[hi - 1]) + 1
            rows.extend(_na_split(c, s1, e1, y, w, na_run))
    return rows


def _na_split(c, s1, e1, y, w, na_run):
    """CBS.R:84-130 — split over long NA runs, weighted-mean ratios."""
    seg_na = np.isnan(y[s1 - 1 : e1])
    d = np.diff(seg_na.astype(int))
    run_before = np.where(d == 1)[0] + s1  # 1-based last non-NA before run
    run_last = np.where(d == -1)[0] + s1  # 1-based last NA of run
    long = (run_last - run_before) > na_run
    starts = np.concatenate([[s1], run_last[long]])
    ends = np.concatenate([run_before[long], [e1]])
    ok = (ends - starts) > 0  # CBS.R:103 — pieces of >= 2 bins
    out = []
    for s, e in zip(starts[ok], ends[ok]):
        yy, ww = y[s - 1 : e], w[s - 1 : e]
        good = ~np.isnan(yy)
        r = (
            float(np.sum(yy[good] * ww[good]) / np.sum(ww[good]))
            if good.any()
            else float("nan")
        )
        out.append([c, int(s) - 1, int(e), round(r, 4)])
    return out
