"""CBS segmentation tests: breakpoint recovery, null behavior, and the
CBS.R post-processing semantics (NA-run splits, rounding, 0-based starts)."""

import numpy as np
import pytest

from wisecondorx_tpu.ops import cbs as cbs_ops

CFG = cbs_ops.CBSConfig(alpha=1e-3, nperm=2000, perm_batch=500, seed=0)
BINSIZE = 100000  # NA-run split threshold = 20 bins


def _genome(chr1_values, chr1_weights=None, n_chr=23):
    """Wrap one test chromosome into per-chr result lists (others empty)."""
    rs = [np.asarray(chr1_values, dtype=float)] + [
        np.zeros(5) for _ in range(n_chr - 1)
    ]
    if chr1_weights is None:
        chr1_weights = np.ones(len(chr1_values))
    ws = [np.asarray(chr1_weights, dtype=float)] + [
        np.zeros(5) for _ in range(n_chr - 1)
    ]
    return rs, ws


def test_single_step_breakpoint():
    rng = np.random.default_rng(0)
    y = np.concatenate([rng.normal(0, 0.08, 100), rng.normal(0.6, 0.08, 100)])
    y[y == 0] = 1e-9  # zero means "blacklisted" to CBS
    rs, ws = _genome(y)
    segs = cbs_ops.exec_cbs(rs, ws, "F", BINSIZE, CFG)
    assert len(segs) == 2
    assert segs[0][0] == 0 and segs[1][0] == 0
    assert segs[0][1] == 0 and segs[1][2] == 200
    assert abs(segs[0][2] - 100) <= 1  # breakpoint within one bin
    assert abs(segs[0][3] - 0.0) < 0.05
    assert abs(segs[1][3] - 0.6) < 0.05


def test_null_data_single_segment():
    rng = np.random.default_rng(1)
    y = rng.normal(0.01, 0.1, 300)
    rs, ws = _genome(y)
    segs = cbs_ops.exec_cbs(rs, ws, "F", BINSIZE, CFG)
    assert len(segs) == 1
    assert segs[0][1] == 0 and segs[0][2] == 300


def test_focal_event_three_segments():
    rng = np.random.default_rng(2)
    y = rng.normal(0, 0.08, 250)
    y[120:140] += 0.8
    rs, ws = _genome(y)
    segs = cbs_ops.exec_cbs(rs, ws, "F", BINSIZE, CFG)
    assert len(segs) == 3
    assert abs(segs[1][1] - 120) <= 1 and abs(segs[1][2] - 140) <= 1
    assert abs(segs[1][3] - 0.8) < 0.1


def test_male_includes_chr24():
    rng = np.random.default_rng(3)
    rs, ws = _genome(rng.normal(0, 0.1, 50), n_chr=24)
    rs[23] = rng.normal(-1.0, 0.1, 30)  # chrY data
    ws[23] = np.ones(30)
    segs_m = cbs_ops.exec_cbs(rs, ws, "M", BINSIZE, CFG)
    segs_f = cbs_ops.exec_cbs(rs, ws, "F", BINSIZE, CFG)
    assert any(s[0] == 23 for s in segs_m)
    assert not any(s[0] == 23 for s in segs_f)


def test_na_run_split_semantics():
    """A long run of blacklisted (0 -> NA) bins splits the segment; the
    piece after the run starts on the run's last NA bin (CBS.R:100-101's
    exact off-by-one) and single-bin pieces are dropped."""
    rng = np.random.default_rng(7)
    y = rng.normal(0.3, 0.05, 100)
    y[40:70] = 0.0  # 30 NA bins > threshold of 20
    rs, ws = _genome(y)
    segs = cbs_ops.exec_cbs(rs, ws, "F", BINSIZE, CFG)
    assert len(segs) == 2
    # piece 1: bins 0..39 (1-based 1..40) -> 0-based [0, 40)
    assert segs[0][1] == 0 and segs[0][2] == 40
    # piece 2 starts at the run's last NA bin: 1-based 70 -> 0-based 69
    assert segs[1][1] == 69 and segs[1][2] == 100
    assert segs[0][3] == pytest.approx(0.3, abs=0.05)


def test_short_na_run_not_split():
    rng = np.random.default_rng(8)
    y = rng.normal(0.3, 0.05, 100)
    y[40:50] = 0.0  # 10 NA bins < threshold
    rs, ws = _genome(y)
    segs = cbs_ops.exec_cbs(rs, ws, "F", BINSIZE, CFG)
    assert len(segs) == 1
    assert segs[0][1] == 0 and segs[0][2] == 100


def test_all_na_chromosome_dropped():
    rs, ws = _genome(np.zeros(50))
    segs = cbs_ops.exec_cbs(rs, ws, "F", BINSIZE, CFG)
    assert segs == []


def test_ratio_rounded_4_decimals():
    y = np.full(60, 0.123456789)
    rs, ws = _genome(y)
    segs = cbs_ops.exec_cbs(rs, ws, "F", BINSIZE, CFG)
    assert segs[0][3] == 0.1235


def test_weighted_mean_recompute():
    y = np.concatenate([np.full(30, 0.1), np.full(30, 0.5)])
    w = np.concatenate([np.full(30, 1.0), np.full(30, 3.0)])
    rs, ws = _genome(y, w)
    segs = cbs_ops.exec_cbs(rs, ws, "F", BINSIZE, CFG)
    if len(segs) == 1:
        expected = (0.1 * 30 + 0.5 * 90) / 120
        assert segs[0][3] == pytest.approx(expected, abs=1e-4)
    else:
        assert segs[0][3] == pytest.approx(0.1, abs=1e-4)
        assert segs[1][3] == pytest.approx(0.5, abs=1e-4)
