"""Circular binary segmentation (CBS) — JAX reimplementation of the
reference's R/DNAcopy subprocess (reference predict_tools.py:242-275 +
include/CBS.R), removing the Python->JSON->Rscript round-trip entirely.

Algorithm (Olshen et al. 2004; weighted statistic as in DNAcopy's weighted
path, which the reference always uses since CBS.R:73 passes weights):

* per chromosome, non-NA bins are segmented recursively;
* for a segment of n bins, the split statistic is the max over circular
  arcs (i, j] (arc and complement each >= min_width bins) of
  ``|T| = |(X1/W1 - X0/W0)| / sqrt(1/W1 + 1/W0)`` with W/X the arc's
  weight / weighted-value sums — one O(n^2) pass evaluated as a scan over
  arc lengths with vectorized starts (MXU/VPU friendly, no data-dependent
  shapes: segments are padded to power-of-two buckets);
* significance via permutation: batches of device-vectorized permutations
  with early termination once the exceedance count proves p > alpha —
  the Monte-Carlo decision DNAcopy reaches through its sequential boundary
  (eta/sbdry machinery) without the per-permutation Fortran loop;
* where DNAcopy switches to its "hybrid" analytic tail approximation for
  long arcs (kmax=25), we instead test the max over a *thinned arc-length
  family* — all short arcs up to kmax exactly, plus a geometric grid of
  longer lengths — using the SAME family for the observed and the permuted
  statistic.  That keeps the test an exact Monte-Carlo permutation test of
  a slightly less powerful statistic (the grid captures near-100% of the
  full max because arc maxima are strongly correlated across neighbouring
  lengths) while cutting per-permutation cost from O(n^2) to O(n log n);
* once a split is significant, the breakpoint is located with the exact
  full O(n^2) scan (run once per accepted split, like DNAcopy's
  detection/location separation);
* significant arcs split the segment at i / j (edge arcs give one split).

Post-processing mirrors CBS.R exactly:

* zero ratios enter as NA (blacklist), zero weights become 1.0 — CBS.R:42
  writes ``1^-99`` which is literally 1.0, an R typo kept for parity;
* all-NA chromosomes emit no segments (CBS.R:56-63);
* segments spanning NA runs longer than ``int(2e6 / binsize)`` bins are
  split, keeping only pieces of length > 1, with the piece after a run
  starting on the run's last NA bin — CBS.R:84-113's exact off-by-one;
* segment ratios are recomputed as weighted means over the segment's bins
  (NA-removed) and rounded to 4 decimals — the rounding the reference
  inherits silently from jsonlite::write_json's digits=4 default;
* starts are converted to 0-based (CBS.R:129).

Determinism: the reference seeds R's RNG only when --seed is given
(CBS.R:67-69); here a JAX PRNG key derived from ``seed`` (default 0) makes
segmentation reproducible by default.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CBSConfig:
    alpha: float = 1e-4
    nperm: int = 10000
    min_width: int = 2
    perm_batch: int = 1024
    seed: int | None = 0
    #: All arc lengths <= kmax are tested exactly (DNAcopy's kmax).
    kmax: int = 25
    #: Geometric spacing of the long-arc length grid.
    length_ratio: float = 1.08
    #: Segments up to this size use the exact all-lengths arc family for
    #: the permutation test too (the thinned grid only kicks in above it,
    #: where its O(n log n) cost matters).
    exact_max: int = 2048
    #: Significance method: "perm" (Monte-Carlo permutation, default) or
    #: "hybrid" (DNAcopy-style: permutation over short arcs <= kmax plus a
    #: Siegmund-type analytic tail bound for the long arcs).
    p_method: str = "perm"
    #: Deterministic mode: accept a split iff the observed max |T| >= this
    #: value, skipping the permutation test entirely.  Makes segmentation
    #: a pure function of the data (reproducible across machines and RNGs,
    #: and fast); also the hook the differential test oracle uses
    #: (tests/cbs_oracle.py).
    t_threshold: float | None = None


# ---------------------------------------------------------------------------
# Statistic kernels
# ---------------------------------------------------------------------------


def _tstat_scan(cw, cwx, n, lengths, min_width):
    """Max |T| over arcs with lengths from ``lengths``; returns (max, i*, L*).

    ``cw``/``cwx`` are zero-prefixed cumulative sums, possibly batched with
    a leading axis.  Scans arc length L, vectorizing over arc starts i.
    Entries of ``lengths`` that are 0 (padding) or outside
    [min_width, n - min_width] are ignored.
    """
    batched = cw.ndim == 2
    n_pad = cw.shape[-1] - 1
    B = cw.shape[0] if batched else 1
    cw = cw if batched else cw[None]
    cwx = cwx if batched else cwx[None]

    w_tot = jnp.take(cw, n, axis=1)  # [B]
    x_tot = jnp.take(cwx, n, axis=1)
    i_idx = jnp.arange(n_pad + 1)
    # Arc end = start + L is a uniform shift: a contiguous dynamic slice
    # of the edge-padded cumsums replaces the [B, n] gather (gathers are
    # the slow path on the TPU VPU; slices are free).
    cw2 = jnp.pad(cw, ((0, 0), (0, n_pad + 1)), mode="edge")
    cwx2 = jnp.pad(cwx, ((0, 0), (0, n_pad + 1)), mode="edge")

    def body(carry, L):
        best, best_i, best_l = carry
        w1 = jax.lax.dynamic_slice_in_dim(cw2, L, n_pad + 1, axis=1) - cw
        x1 = jax.lax.dynamic_slice_in_dim(cwx2, L, n_pad + 1, axis=1) - cwx
        w0 = w_tot[:, None] - w1
        x0 = x_tot[:, None] - x1
        t = (x1 / w1 - x0 / w0) * jax.lax.rsqrt(1.0 / w1 + 1.0 / w0)
        valid = (
            (i_idx[None, :] + L <= n)
            & (L >= min_width)
            & (L <= n - min_width)
        )
        t = jnp.where(valid, jnp.abs(t), -jnp.inf)
        m = jnp.max(t, axis=1)
        am = jnp.argmax(t, axis=1)
        better = m > best
        return (
            jnp.where(better, m, best),
            jnp.where(better, am.astype(jnp.int32), best_i),
            jnp.where(better, L, best_l),
        ), None

    init = (
        jnp.full((B,), -jnp.inf, cw.dtype),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    (best, best_i, best_l), _ = jax.lax.scan(
        body, init, lengths.astype(jnp.int32)
    )
    if not batched:
        return best[0], best_i[0], best_l[0]
    return best, best_i, best_l


@functools.partial(jax.jit, static_argnames=("min_width",))
def _observed_stat(x, w, n, lengths, min_width: int):
    cw = jnp.concatenate([jnp.zeros(1, x.dtype), jnp.cumsum(w)])
    cwx = jnp.concatenate([jnp.zeros(1, x.dtype), jnp.cumsum(w * x)])
    return _tstat_scan(cw, cwx, n, lengths, min_width)


@functools.partial(jax.jit, static_argnames=("n_pad", "batch"))
def _device_perms(key, n, *, n_pad: int, batch: int):
    """[batch, n_pad] random permutations of the first ``n`` slots
    (identity on the padding), generated on device.

    Shuffle-by-sorting-random-keys, with the sort done by an explicit
    bitonic network of vectorized compare-exchanges (reshape + min/max —
    no gathers, no scatters, no ``lax.sort``): a Fisher-Yates needs n
    sequential scatter steps (~seconds per batch at 16k bins), and
    ``jax.random.permutation``'s argsort lowering hits the pathologically
    slow TPU sort remote-compile (ROADMAP.md).  Host-side generation is
    no better — the [nperm, n] tables would move ~0.6 GB per confirmed
    split over the ~46 MB/s tunnel.

    Ties in the 32-bit sort keys break deterministically by slot index
    (P(any tie) ~ n^2/2^33 per row; the uniformity deviation is far below
    Monte-Carlo resolution).  Padding slots carry +inf-like keys ordered
    by index, so they stay put at the tail.
    """
    # Sort keys: random u32 for real slots; huge, index-ordered for pads.
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    rand = jax.random.bits(key, (batch, n_pad), dtype=jnp.uint32)
    # Clear the top bit of real keys and set it on padding keys: padding
    # sorts after every real slot, among themselves by index.
    rand = rand & jnp.uint32(0x7FFFFFFF)
    rand = jnp.where(idx[None, :] < n, rand, jnp.uint32(0x80000000))
    vals = jnp.broadcast_to(idx[None, :], (batch, n_pad))

    def lex_gt(ka, va, kb, vb):
        return (ka > kb) | ((ka == kb) & (va > vb))

    keys, vals = rand, vals
    m = n_pad
    bs = 2
    while bs <= m:
        d = bs // 2
        while d >= 1:
            k4 = keys.reshape(batch, m // (2 * d), 2, d)
            v4 = vals.reshape(batch, m // (2 * d), 2, d)
            ka, kb = k4[:, :, 0], k4[:, :, 1]
            va, vb = v4[:, :, 0], v4[:, :, 1]
            g = jnp.arange(m // (2 * d), dtype=jnp.int32)
            asc = (((g * 2 * d) // bs) % 2 == 0)[None, :, None]
            gt = lex_gt(ka, va, kb, vb)
            swap = jnp.where(asc, gt, ~gt)
            na_k = jnp.where(swap, kb, ka)
            nb_k = jnp.where(swap, ka, kb)
            na_v = jnp.where(swap, vb, va)
            nb_v = jnp.where(swap, va, vb)
            keys = jnp.stack([na_k, nb_k], axis=2).reshape(batch, m)
            vals = jnp.stack([na_v, nb_v], axis=2).reshape(batch, m)
            d //= 2
        bs *= 2
    return vals


@functools.partial(jax.jit, static_argnames=("min_width",))
def _perm_exceed_count(x, w, n, lengths, obs, order, min_width: int):
    """Count permutations whose grid-max |T| >= the observed grid-max.

    ``order`` is a [batch, n_pad] permutation table (each row permutes
    the first n slots, identity on the padding).  (Value, weight) pairs
    permute jointly — bins are exchangeable with their precisions under
    H0.
    """
    xp = jnp.take(x, order)
    wp = jnp.take(w, order)
    zero = jnp.zeros((order.shape[0], 1), x.dtype)
    cw = jnp.concatenate([zero, jnp.cumsum(wp, axis=1)], axis=1)
    cwx = jnp.concatenate([zero, jnp.cumsum(wp * xp, axis=1)], axis=1)
    best, _, _ = _tstat_scan(cw, cwx, n, lengths, min_width)
    return jnp.sum(best >= obs)


def _bucket(n: int) -> int:
    p = 8
    while p < n:
        p *= 2
    return p


def _arc_lengths(n: int, cfg: CBSConfig, short_only: bool = False):
    """Arc-length test family, zero-padded to a bucketed size.

    * n <= exact_max: every length in [min_width, n - min_width] — the
      test statistic is then identical to DNAcopy's full max;
    * larger n: all lengths up to kmax (and their circular mirrors) plus a
      geometric grid — the thinned family documented in the module
      docstring;
    * short_only: only lengths <= kmax and their mirrors (the
      permutation part of the hybrid p-value).
    """
    mw = cfg.min_width
    top = n - mw
    if top < mw:
        return np.zeros(8, dtype=np.int32)
    if n <= cfg.exact_max and not short_only:
        out = np.arange(mw, top + 1, dtype=np.int32)
    else:
        ls = set(range(mw, min(cfg.kmax, top) + 1))
        ls.update(range(max(mw, n - cfg.kmax), top + 1))
        if not short_only:
            length = float(cfg.kmax)
            while length < top:
                length = max(length * cfg.length_ratio, length + 1.0)
                ls.add(min(int(length), top))
        out = np.array(sorted(ls), dtype=np.int32)
    padded = np.zeros(_bucket(len(out)), dtype=np.int32)
    padded[: len(out)] = out
    return padded


# ---------------------------------------------------------------------------
# Analytic tail (the "hybrid" option)
# ---------------------------------------------------------------------------


def _nu(x):
    """Siegmund's overshoot correction nu(x) (computable approximation)."""
    x = np.maximum(np.asarray(x, dtype=np.float64), 1e-8)
    from scipy.stats import norm as _norm

    phi = _norm.pdf(x / 2)
    Phi = _norm.cdf(x / 2)
    return ((2.0 / x) * (Phi - 0.5)) / ((x / 2) * Phi + phi)


def _tail_prob_long_arcs(b: float, n: int, kmax: int) -> float:
    """P(max over arcs longer than kmax of |T| >= b) under H0.

    Siegmund-type approximation for the maximum of the standardized
    two-sample statistic over the TWO-parameter family (arc start and arc
    length fraction t in (kmax/n, 1/2]):

        p ~= b^3 * phi(b) * Int nu(b*sqrt(2/(n t(1-t))))^2 / (t(1-t))^2 dt

    — the two-parameter field version of the formula behind DNAcopy's
    hybrid `tailp` (structurally equivalent, not claimed bit-identical).
    Empirical calibration (tests/test_cbs_battery.py): within a factor ~2
    of Monte-Carlo in the moderate tail at n=200, erring conservative
    (over-estimating p, i.e. under-splitting).  Returns 1.0 for tiny b.
    """
    from scipy.stats import norm as _norm

    if not np.isfinite(b) or b <= 1.0:
        return 1.0
    t0 = max(kmax / n, 1e-6)
    if t0 >= 0.5:
        return 0.0
    t = np.linspace(t0, 0.5, 1024)
    tt = t * (1.0 - t)
    integrand = _nu(b * np.sqrt(2.0 / (n * tt))) ** 2 / tt**2
    integral = np.trapezoid(integrand, t)
    p = float(b**3 * _norm.pdf(b) * integral)
    return min(max(p, 0.0), 1.0)


# ---------------------------------------------------------------------------
# Recursion
# ---------------------------------------------------------------------------


def _test_split(x, w, cfg: CBSConfig, rng: np.random.Generator):
    """Test one segment for a significant circular split.

    Returns (significant, i, j) with 0 <= i < j <= n boundaries.
    """
    n = len(x)
    if n < 2 * cfg.min_width:
        return False, 0, 0
    n_pad = _bucket(n)
    xp = np.zeros(n_pad, dtype=np.float64)
    wp = np.zeros(n_pad, dtype=np.float64)
    xp[:n] = x
    wp[:n] = w
    xj, wj = jnp.asarray(xp), jnp.asarray(wp)
    lengths = jnp.asarray(_arc_lengths(n, cfg))

    obs, _, _ = _observed_stat(xj, wj, jnp.int32(n), lengths, cfg.min_width)
    obs_f = float(obs)
    if not np.isfinite(obs_f) or obs_f <= 0:
        return False, 0, 0

    if cfg.t_threshold is not None:
        if obs_f < cfg.t_threshold:
            return False, 0, 0
        return _locate_split(xj, wj, n, n_pad, cfg)

    perm_lengths = lengths
    alpha_budget = cfg.alpha
    if cfg.p_method == "hybrid" and n > cfg.exact_max:
        # DNAcopy-style hybrid: analytic tail bound for the long arcs plus
        # a permutation estimate over the short arcs, both against the
        # observed full max.
        p_tail = _tail_prob_long_arcs(obs_f, n, cfg.kmax)
        if p_tail > cfg.alpha:
            return False, 0, 0
        alpha_budget = cfg.alpha - p_tail
        perm_lengths = jnp.asarray(_arc_lengths(n, cfg, short_only=True))

    # Monte-Carlo decision with early termination: once the exceedance
    # count makes p > the budget certain, stop permuting.
    # Batches always run at full perm_batch width (a single compiled kernel
    # per segment-size bucket); nperm acts as the minimum total drawn.
    # Permutations generate on device (see _device_perms) from a key
    # derived from the caller's seeded host RNG.
    max_ones = int(np.floor(cfg.nperm * alpha_budget)) + 1
    exceed = 0
    done = 0
    # TPU: permutations generate on device (bitonic shuffle) — host tables
    # would move ~0.6 GB per confirmed split over the tunnel.  CPU (the
    # f64 parity/test path): a numpy Fisher-Yates per batch is faster
    # than interpreting the unrolled sorting network.
    on_tpu = jax.default_backend() == "tpu"
    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    base = (
        None
        if on_tpu
        else np.tile(np.arange(n_pad, dtype=np.int32), (cfg.perm_batch, 1))
    )
    while done < cfg.nperm and exceed < max_ones:
        if on_tpu:
            key, sub = jax.random.split(key)
            order = _device_perms(
                sub, jnp.int32(n), n_pad=n_pad, batch=cfg.perm_batch
            )
        else:
            order = base.copy()
            order[:, :n] = rng.permuted(order[:, :n], axis=1)
            order = jnp.asarray(order)
        exceed += int(
            _perm_exceed_count(
                xj, wj, jnp.int32(n), perm_lengths, obs,
                order, cfg.min_width,
            )
        )
        done += cfg.perm_batch

    if exceed >= max_ones:
        return False, 0, 0
    return _locate_split(xj, wj, n, n_pad, cfg)


def _locate_split(xj, wj, n, n_pad, cfg):
    """Locate an accepted split with the exact all-lengths scan."""
    all_lengths = jnp.arange(n_pad, dtype=jnp.int32)
    _, i_star, l_star = _observed_stat(
        xj, wj, jnp.int32(n), all_lengths, cfg.min_width
    )
    i = int(i_star)
    j = i + int(l_star)
    return True, i, j


def _segment_values(x, w, cfg: CBSConfig, chrom_seed):
    """Recursive CBS over one chromosome's non-NA values.

    Returns a sorted list of (lo, hi) half-open index ranges.
    """
    n = len(x)
    final = []
    stack = [(0, n)]
    t = 0
    while stack:
        lo, hi = stack.pop()
        t += 1
        rng = np.random.default_rng(list(chrom_seed) + [t])
        sig, i, j = _test_split(x[lo:hi], w[lo:hi], cfg, rng)
        if not sig:
            final.append((lo, hi))
            continue
        pieces = [(lo, lo + i), (lo + i, lo + j), (lo + j, hi)]
        for p in pieces:
            if p[1] > p[0]:
                stack.append(p)
    return sorted(final)


# ---------------------------------------------------------------------------
# Full CBS.R-equivalent driver
# ---------------------------------------------------------------------------


def exec_cbs(
    results_r: list,
    results_w: list,
    ref_gender: str,
    binsize: int,
    cfg: CBSConfig = CBSConfig(),
) -> list:
    """Segment the per-chromosome log2 ratios.

    Returns rows ``[chr0, start, end, ratio]`` with 0-based half-open bin
    ranges per chromosome and 4-decimal ratios, matching what the reference
    reads back from CBS.R via JSON (predict_tools.py:266-275).
    """
    n_chr = 24 if ref_gender == "M" else 23
    seed = cfg.seed if cfg.seed is not None else 0
    na_run_threshold = int(2e6 / binsize)  # CBS.R:95 ((binsize/2e6)^-1)

    out = []
    for c in range(n_chr):
        y = np.asarray(results_r[c], dtype=np.float64).copy()
        w = np.asarray(results_w[c], dtype=np.float64).copy()
        y[y == 0] = np.nan  # blacklist -> NA (CBS.R:41)
        w[w == 0] = 1.0  # CBS.R:42's 1^-99 == 1.0
        keep = ~np.isnan(y)
        if not keep.any():
            continue  # all-NA chromosome dropped (CBS.R:56-63)
        pos = np.nonzero(keep)[0]  # 0-based original bin positions
        yv = y[keep]
        wv = w[keep]

        for lo, hi in _segment_values(yv, wv, cfg, (seed, c)):
            # DNAcopy endpoints: 1-based inclusive positions of the first
            # and last non-NA bin of the segment.
            s1 = int(pos[lo]) + 1
            e1 = int(pos[hi - 1]) + 1
            out.extend(
                _postprocess_segment(c, s1, e1, y, w, na_run_threshold)
            )
    return out


def _postprocess_segment(c, s1, e1, y, w, thresh):
    """NA-run splitting + weighted-mean recompute (CBS.R:82-130).

    ``s1``/``e1`` are 1-based inclusive positions on the full chromosome.
    """
    seg = y[s1 - 1 : e1]  # R's y[start.i:end.i]
    isna = np.isnan(seg).astype(np.int64)
    diff = np.diff(isna)
    start_pos = np.nonzero(diff == 1)[0] + s1  # last non-NA before each run
    end_pos = np.nonzero(diff == -1)[0] + s1  # last NA of each run
    sel = (end_pos - start_pos) > thresh
    start_pos = start_pos[sel]
    end_pos = end_pos[sel]

    inv_start = np.concatenate([[s1], end_pos])
    inv_end = np.concatenate([start_pos, [e1]])
    sel2 = (inv_end - inv_start) > 0  # pieces must be >= 2 bins (CBS.R:103)
    if not sel2.any():
        return []
    inv_start = inv_start[sel2]
    inv_end = inv_end[sel2]

    rows = []
    for s, e in zip(inv_start, inv_end):
        yy = y[s - 1 : e]
        ww = w[s - 1 : e]
        ok = ~np.isnan(yy)
        if ok.any():
            r = float(np.sum(yy[ok] * ww[ok]) / np.sum(ww[ok]))
        else:
            r = float("nan")
        # jsonlite::write_json digits=4 — the rounding the reference's
        # downstream silently inherits.
        rows.append([c, int(s) - 1, int(e), round(r, 4)])
    return rows
