"""Shared statistical/comparison helpers used by both the committed
test suite and the dev study drivers (dev/cbs_calibration.py) — one
definition so the CI gate and the study can never disagree about what
an interval or an "equal output" means."""

from __future__ import annotations

import numpy as np


def wilson_ci(k: int, n: int, z: float = 1.96):
    """Wilson score interval for a binomial proportion k/n."""
    p = k / n
    den = 1 + z * z / n
    mid = (p + z * z / (2 * n)) / den
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return mid - half, mid + half


def bed_rows(path: str):
    """Data rows of a BED/statistics table, split on tabs."""
    lines = open(path).read().strip().split("\n")
    return [ln.split("\t") for ln in lines[1:]]


def assert_bed_rows_close(got_path, want_path, rtol=1e-8, atol=1e-9):
    """Per-row tolerant comparison of two BED tables.

    Coordinates (first three columns) must match exactly; numeric cells
    to (rtol, atol) — the vmapped batch kernel's fusion differs from
    the single-sample kernel at the ~1e-15 level.  The 0 -> "nan"
    blacklist rule (output/tables.py, reference predict_output.py) makes
    a bin sitting exactly at the median log-ratio print as nan in one
    path and ~1e-18 in the other, so nan-vs-|x|<1e-12 pairs are treated
    as equal."""
    got, want = bed_rows(got_path), bed_rows(want_path)
    assert len(got) == len(want), (got_path, want_path, "row count")
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (got_path, "coords", g[:3], w[:3])
        for gv, wv in zip(g[3:], w[3:]):
            try:
                gf, wf = float(gv), float(wv)
            except ValueError:
                assert gv == wv
                continue
            if (np.isnan(gf) and (np.isnan(wf) or abs(wf) < 1e-12)) or (
                np.isnan(wf) and abs(gf) < 1e-12
            ):
                continue
            np.testing.assert_allclose(gf, wf, rtol=rtol, atol=atol)
