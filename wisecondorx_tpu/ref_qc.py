"""Reference quality control.

Vectorized rebuild of reference ref_qc.py:1-218 (a fork addition): per
gender pass, per-bin mean/max neighbour distance and neighbour-count
statistics feed PASS/WARN/FAIL heuristics.  Note the reference's newref
stage *calls* qc_reference without importing it and dies with NameError
after writing its outputs (reference main.py:135, SURVEY.md 2.15) — here
the call is real.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

MINREFBINS = 150
OUTLIER_N_SIGMA = 3

PASS, WARN, FAIL = 0, 1, 2


def _gender_suffixes(keys):
    out = []
    if "bins_per_chr.F" in keys:
        out.append(".F")
    if "bins_per_chr.M" in keys:
        out.append(".M")
    if "bins_per_chr" in keys and not out:
        out.append("")
    return out


def _compute_metrics(ref, suf):
    idx_key, dist_key = "indexes" + suf, "distances" + suf
    if idx_key not in ref or dist_key not in ref:
        return None
    indexes = np.atleast_2d(ref[idx_key])
    distances = np.atleast_2d(np.asarray(ref[dist_key], dtype=float))
    n_bins = len(indexes)
    if n_bins == 0:
        return {"n_bins": 0}

    mean_d = distances.mean(axis=1)
    n_refs = np.full(n_bins, indexes.shape[1], dtype=int)
    valid = np.isfinite(mean_d)
    n_valid = int(valid.sum())
    if n_valid == 0:
        return {"n_bins": n_bins, "n_valid": 0}

    mean_of_means = float(mean_d[valid].mean())
    std_of_means = float(mean_d[valid].std())
    cutoff_outlier = mean_of_means + OUTLIER_N_SIGMA * std_of_means
    n_mean_outlier = int(np.sum(mean_d[valid] >= cutoff_outlier))
    n_low_refs = int(np.sum(n_refs < MINREFBINS))
    metrics = {
        "n_bins": n_bins,
        "n_valid": n_valid,
        "mean_of_means": mean_of_means,
        "std_of_means": std_of_means,
        "n_mean_outlier": n_mean_outlier,
        "outlier_pct": 100.0 * n_mean_outlier / n_valid,
        "n_low_refs": n_low_refs,
        "chrY": None,
    }

    if suf == ".M":
        key = "masked_bins_per_chr_cum" + suf
        if key in ref:
            mbpcc = np.atleast_1d(ref[key][...])
            if len(mbpcc) >= 24:
                start, end = int(mbpcc[22]), int(mbpcc[23])
                if start < end:
                    m = mean_d[start:end]
                    r = n_refs[start:end]
                    v = np.isfinite(m)
                    cy = {"n_bins": end - start, "n_valid": int(v.sum())}
                    if v.any():
                        cy.update(
                            mean_of_means=float(m[v].mean()),
                            std_of_means=float(m[v].std()),
                            n_mean_outlier=int(
                                np.sum(m[v] >= cutoff_outlier)
                            ),
                            n_low_refs=int(np.sum(r < MINREFBINS)),
                        )
                    else:
                        cy["mean_of_means"] = float("nan")
                    metrics["chrY"] = cy
                else:
                    metrics["chrY"] = {"n_bins": 0}
    return metrics


def _verdict_f(m):
    if m is None or m.get("n_valid", 0) == 0:
        return FAIL, "no data"
    if m["n_low_refs"] > 0:
        return WARN, f"n_refs<{MINREFBINS} in {m['n_low_refs']} bins"
    if m["std_of_means"] > 10:
        return FAIL, f"std(per-bin mean dist) = {m['std_of_means']:.2f} (high)"
    if m["std_of_means"] > 2:
        return WARN, f"std(per-bin mean dist) = {m['std_of_means']:.2f}"
    if m["outlier_pct"] > 1:
        return WARN, f"outlier bins = {m['outlier_pct']:.2f}%"
    return PASS, ""


def _verdict_m(m):
    if m is None or m.get("n_valid", 0) == 0:
        return FAIL, "no data"
    if m["n_low_refs"] > 0:
        return WARN, f"n_refs<{MINREFBINS} in {m['n_low_refs']} bins"
    if m["mean_of_means"] > 10:
        return FAIL, (
            f"mean(per-bin mean dist) = {m['mean_of_means']:.2f} (heavy tail)"
        )
    if m["mean_of_means"] > 2:
        return WARN, f"mean(per-bin mean dist) = {m['mean_of_means']:.2f}"
    cy = m.get("chrY")
    if (
        cy
        and cy.get("n_valid", 0) > 0
        and np.isfinite(cy.get("mean_of_means", float("nan")))
    ):
        ym = cy["mean_of_means"]
        if ym > 100:
            return FAIL, f"chrY mean distance = {ym:.1f} (very poor chrY)"
        if ym > 5:
            return WARN, f"chrY mean distance = {ym:.1f}"
    if m["outlier_pct"] > 1:
        return WARN, f"outlier bins = {m['outlier_pct']:.2f}%"
    return PASS, ""


def qc_reference(npz_path) -> int:
    """Check a reference npz for common quality issues.

    Returns the worst severity found: 0 (PASS), 1 (WARN), 2 (FAIL).
    """
    npz = Path(npz_path).resolve()
    if not npz.exists():
        logging.error("QC check skipped: file not found: %s", npz)
        return FAIL

    ref = np.load(npz, encoding="latin1", allow_pickle=True)
    try:
        binsize = int(np.atleast_1d(ref["binsize"])[0])
    except Exception:
        binsize = None

    suffixes = _gender_suffixes(list(ref.keys()))
    if not suffixes:
        logging.error(
            "QC failed: no bins_per_chr / bins_per_chr.F / bins_per_chr.M "
            "in npz"
        )
        return FAIL

    logging.info("Starting ref-QC for file: %s", npz)
    logging.info("Reference binsize: %s bp", binsize or "(unknown)")

    worst = PASS
    for suf in suffixes:
        label = "F" if suf == ".F" else "M" if suf == ".M" else "A"
        m = _compute_metrics(ref, suf)
        if m is None:
            logging.warning("[%s] no indexes/distances — skip", label)
            continue
        if m.get("n_valid", 0) == 0:
            logging.error(
                "[%s] n_bins=%d, n_valid=0 — FAIL", label, m["n_bins"]
            )
            worst = max(worst, FAIL)
            continue

        verdict, msg = (_verdict_m if label == "M" else _verdict_f)(m)
        worst = max(worst, verdict)
        log = {PASS: logging.info, WARN: logging.warning, FAIL: logging.error}[
            verdict
        ]
        log(
            "[%s] n_bins=%d, mean(dist)=%.4f, std(dist)=%.4f, "
            "outliers=%d (%.2f%%), n_refs<%d=%d",
            label, m["n_bins"], m["mean_of_means"], m["std_of_means"],
            m["n_mean_outlier"], m["outlier_pct"], MINREFBINS, m["n_low_refs"],
        )
        verdict_name = {PASS: "PASS", WARN: "WARN", FAIL: "FAIL"}[verdict]
        log("         -> %s%s", verdict_name, f": {msg}" if msg else "")

    if worst == PASS:
        logging.info("QC Overall Verdict: PASS")
    elif worst == WARN:
        logging.warning("QC Overall Verdict: WARN (review metrics above)")
    else:
        logging.error(
            "QC Overall Verdict: FAIL (ref may cause poor predictions; "
            "consider rebuilding or more samples)"
        )
    return worst
