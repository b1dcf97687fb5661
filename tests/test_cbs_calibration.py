"""Statistical calibration pinning test for the weighted CBS
permutation decision (the committed, CPU-sized slice of the full study
in dev/cbs_calibration.py / docs/cbs_calibration.md).

Under an i.i.d. Gaussian null with skewed weights, the engine's split
decision at significance alpha must realize a Type-I level inside the
binomial band around the attainable target — a permutation test with
p = (hits+1)/(nperm+1) rejects with probability at most
floor(alpha*(nperm+1))/(nperm+1) under exchangeability, and must not be
anti-conservative.  Reference anchor: DNAcopy segment(weights=...) as
invoked by /root/reference/src/wisecondorx/include/CBS.R:70-73.
"""

import numpy as np

from statutil import wilson_ci
from wisecondorx_tpu.ops.cbs import CBSConfig, _segment_jobs

ALPHA = 0.05
NPERM = 500
REPS = 250
N = 400


def test_null_level_tracks_alpha_skewed_weights():
    rng = np.random.default_rng(424242)
    jobs = []
    for _ in range(REPS):
        y = rng.normal(0.0, 1.0, N)
        w = 10.0 ** rng.uniform(-1.5, 1.5, N)
        jobs.append((y, w))
    cfg = CBSConfig(alpha=ALPHA, nperm=NPERM, seed=7, p_method="perm")
    res = _segment_jobs(jobs, cfg)
    rejected = sum(len(r) > 1 for r in res)
    lo, hi = wilson_ci(rejected, REPS)
    exact_target = np.floor(ALPHA * (NPERM + 1)) / (NPERM + 1)
    # Not anti-conservative: the lower CI bound must not exceed alpha.
    assert lo <= ALPHA, (rejected, REPS, lo, hi)
    # Not vacuously conservative either: the CI must reach the exact
    # attainable target (a test that never rejects would fail here).
    assert hi >= exact_target, (rejected, REPS, lo, hi, exact_target)


def test_null_level_with_na_runs():
    """NA-run dropout (the pipeline removes NA bins before the engine,
    reference CBS.R:41,56-63) must not perturb calibration."""
    rng = np.random.default_rng(31337)
    jobs = []
    for _ in range(REPS):
        y = rng.normal(0.0, 1.0, N)
        w = 10.0 ** rng.uniform(-1.0, 1.0, N)
        k = N // 20
        a = int(rng.integers(0, N - 2 * k - 2))
        keep = np.ones(N, bool)
        keep[a : a + k] = False
        jobs.append((y[keep], w[keep]))
    cfg = CBSConfig(alpha=ALPHA, nperm=NPERM, seed=11, p_method="perm")
    res = _segment_jobs(jobs, cfg)
    rejected = sum(len(r) > 1 for r in res)
    lo, hi = wilson_ci(rejected, REPS)
    exact_target = np.floor(ALPHA * (NPERM + 1)) / (NPERM + 1)
    assert lo <= ALPHA, (rejected, REPS, lo, hi)
    assert hi >= exact_target, (rejected, REPS, lo, hi, exact_target)


def test_power_on_planted_arc():
    """Calibration without power is vacuous: a clear 4.5/sqrt(len)
    planted arc must be detected in essentially every replicate."""
    rng = np.random.default_rng(5150)
    jobs = []
    reps = 30  # planted jobs never early-stop (the engine must run the
    # full permutation budget and recurse), so they dominate runtime
    for _ in range(reps):
        y = rng.normal(0.0, 1.0, N)
        ln = N // 16
        a = int(rng.integers(0, N - ln))
        y[a : a + ln] += 8.0 / np.sqrt(ln)
        w = np.abs(rng.normal(1.0, 0.15, N)) + 1e-3
        jobs.append((y, w))
    cfg = CBSConfig(alpha=0.01, nperm=NPERM, seed=3, p_method="perm")
    res = _segment_jobs(jobs, cfg)
    detected = sum(len(r) > 1 for r in res)
    assert detected >= reps - 1, (detected, reps)
