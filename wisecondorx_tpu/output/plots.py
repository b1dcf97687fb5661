"""Plotting — matplotlib rebuild of include/plotter.R (reference
predict_output.py:19-42 + plotter.R:1-429), dropping the R subprocess.

Produces ``<outid>.plots/genome_wide.png`` plus one PNG per chromosome with
the same visual semantics: dot size proportional to sqrt(weight), grey bars
on undetectable (blacklisted) bins, dashed constitutional 1n/2n/3n lines at
``log2(n/ploidy)``, gain/loss dot coloring by segment z (or beta ratio
cutoffs), translucent segment rectangles, per-chromosome boxplots on the
genome-wide figure, ``--ylim`` override and optional ``--regions`` gene
labels / plot title.

Fixed relative to the reference (documented deviations): plotter.R:33 reads
the regions file unconditionally, so every ``--plot`` run *without*
``--regions`` crashes trying to open the file "None"; here regions are
optional.  The ``--cairo`` flag is accepted for CLI compatibility and is a
no-op (matplotlib's Agg backend always rasterizes).
"""

from __future__ import annotations

import os

import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

BLACK = "#3f3f3f"
LIGHT_GREY = "#e0e0e0"
COLOR_A = (84 / 255, 84 / 255, 84 / 255)  # neutral dots
COLOR_B = (227 / 255, 200 / 255, 138 / 255)  # loss
COLOR_C = (141 / 255, 209 / 255, 198 / 255)  # gain
COLOR_D = (150 / 255, 80 / 255, 33 / 255)  # region highlight


def _chr_label(c):
    return {22: "chrX", 23: "chrY"}.get(c, f"chr{c + 1}")


def _aberration_cutoffs(beta, ploidy):
    return (
        np.log2((ploidy - beta / 2) / ploidy),
        np.log2((ploidy + beta / 2) / ploidy),
    )


def _parse_ylim(ylim):
    if ylim and ylim != "def":
        lo, hi = ylim.strip("[]").split(",")
        return float(lo), float(hi)
    return None


def _dot_colors(n, segments, chr_starts, zscore, beta, ref_gender):
    """Per-bin colors from segment calls (plotter.R:154-182)."""
    colors = np.zeros((n, 3))
    colors[:] = COLOR_A
    for seg in segments:
        chrom, s, e, z, height = seg[0], seg[1], seg[2], seg[3], seg[4]
        lo = chr_starts[chrom] + s
        hi = chr_starts[chrom] + e
        ploidy = 1 if (chrom in (22, 23) and ref_gender == "M") else 2
        if beta is not None:
            loss_cut, gain_cut = _aberration_cutoffs(beta, ploidy)
            if height < loss_cut:
                colors[lo:hi] = COLOR_B
            elif height > gain_cut:
                colors[lo:hi] = COLOR_C
        else:
            if isinstance(z, str):
                colors[lo:hi] = (0.5, 0.5, 0.5)
                continue
            if z < -zscore:
                colors[lo:hi] = COLOR_B
            elif z > zscore:
                colors[lo:hi] = COLOR_C
    return colors


def _constitutional_lines(ax, ploidy, x0, x1):
    for n_copies, col in ((1, COLOR_B), (2, COLOR_A), (3, COLOR_C)):
        y = np.log2(n_copies / ploidy)
        ax.plot([x0, x1], [y, y], color=col, lw=1.5, ls=":", zorder=1)


def _whiskers(values):
    vals = values[~np.isnan(values)]
    if len(vals) == 0:
        return np.nan, np.nan
    q1, q3 = np.percentile(vals, [25, 75])
    iqr = q3 - q1
    lo = vals[vals >= q1 - 1.5 * iqr].min()
    hi = vals[vals <= q3 + 1.5 * iqr].max()
    return lo, hi


def write_plots(
    outid,
    bins,
    segments,
    cfg,
    ylim="def",
    regions=None,
    plot_title=None,
):
    """Write genome-wide + per-chromosome PNGs."""
    out_dir = f"{outid}.plots"
    os.makedirs(out_dir, exist_ok=True)

    n_chr = 24 if bins.ref_gender == "M" else 23
    ratio = np.concatenate(
        [np.asarray(bins.results_r[c], float) for c in range(n_chr)]
    )
    weights = np.concatenate(
        [np.asarray(bins.results_w[c], float) for c in range(n_chr)]
    )
    ratio = np.where(ratio == 0, np.nan, ratio)
    weights = np.where(weights == 0, np.nan, weights)
    bins_per_chr = np.array(
        [len(bins.results_r[c]) for c in range(n_chr)]
    )
    chr_starts = np.concatenate([[0], np.cumsum(bins_per_chr)[:-1]])
    chr_ends = np.cumsum(bins_per_chr)
    total = int(chr_ends[-1])

    colors = _dot_colors(
        total, segments, chr_starts, cfg.zscore, cfg.beta, bins.ref_gender
    )
    dot_size = (weights / np.pi) ** 0.5 * 0.8  # plotter.R:153
    dot_size = np.nan_to_num(dot_size, nan=0.0) * 20  # pt^2 for scatter

    per_chr_whiskers = [
        _whiskers(ratio[chr_starts[c] : chr_ends[c]]) for c in range(n_chr)
    ]
    l_whis = np.array([w[0] for w in per_chr_whiskers])
    h_whis = np.array([w[1] for w in per_chr_whiskers])
    upper = np.nanmax([0.65, np.nanmax(h_whis)]) * 1.25
    lower = np.nanmin([-0.95, np.nanmin(l_whis)]) * 1.25
    override = _parse_ylim(ylim)
    if override:
        lower, upper = override

    gene_labels = _collect_regions(regions, bins.binsize, chr_starts, n_chr)

    _plot_genome_wide(
        out_dir, bins, segments, ratio, colors, dot_size, chr_starts,
        chr_ends, n_chr, lower, upper, l_whis, h_whis, gene_labels,
        plot_title,
    )
    for c in range(n_chr):
        _plot_chromosome(
            out_dir, c, bins, segments, ratio, colors, dot_size,
            chr_starts, chr_ends, per_chr_whiskers[c], override,
            gene_labels,
        )


def _collect_regions(regions, binsize, chr_starts, n_chr):
    out = []
    if regions is None:
        return out
    for line in open(regions):
        parts = line.strip().split("\t")
        if len(parts) < 4:
            continue
        chr_name = parts[0].removeprefix("chr")
        chrom = {"X": 23, "Y": 24}.get(chr_name)
        if chrom is None:
            try:
                chrom = int(chr_name)
            except ValueError:
                continue
        if not (1 <= chrom <= n_chr):
            continue
        start_bin = int(np.ceil(int(parts[1]) / binsize)) + int(
            chr_starts[chrom - 1]
        )
        end_bin = int(np.ceil(int(parts[2]) / binsize)) + int(
            chr_starts[chrom - 1]
        )
        out.append((start_bin, end_bin, parts[3]))
    return out


def _draw_segments(ax, segments, chr_starts, colors, dot_size):
    for seg in segments:
        chrom, s, e, height = seg[0], seg[1], seg[2], seg[4]
        lo = int(chr_starts[chrom] + s)
        hi = int(chr_starts[chrom] + e)
        base = colors[lo] if lo < len(colors) else COLOR_A
        ax.add_patch(
            plt.Rectangle(
                (lo, 0), hi - lo, height,
                facecolor=(*base, 0.3), edgecolor=(*base, 0.3), lw=0.1,
                zorder=2,
            )
        )
        ax.plot(
            [lo, hi], [height, height], color=LIGHT_GREY,
            lw=max(np.nanmean(dot_size[lo:hi]) / 6, 0.8)
            if hi > lo else 1.0,
            zorder=3,
        )


def _draw_gene_labels(ax, gene_labels, ratio):
    for start_bin, end_bin, label in gene_labels:
        xs = np.arange(start_bin, end_bin + 1)
        xs = xs[(xs >= 0) & (xs < len(ratio))]
        if len(xs) == 0:
            continue
        ax.scatter(
            xs, ratio[xs], facecolors="none", edgecolors=[COLOR_D],
            s=40, lw=2, zorder=6,
        )
        seg_vals = ratio[xs]
        if np.all(np.isnan(seg_vals)):
            continue
        if np.nanmean(seg_vals) > 0:
            y = np.nanmax(seg_vals) + 0.2
            va = "bottom"
        else:
            y = np.nanmin(seg_vals) - 0.2
            va = "top"
        ax.text(
            (start_bin + end_bin) / 2, y, label, color=COLOR_D,
            fontsize=8, rotation=90, ha="center", va=va, zorder=6,
        )


def _plot_genome_wide(
    out_dir, bins, segments, ratio, colors, dot_size, chr_starts,
    chr_ends, n_chr, lower, upper, l_whis, h_whis, gene_labels, plot_title,
):
    fig = plt.figure(figsize=(14, 10), dpi=160)
    gs = fig.add_gridspec(
        17, 25, hspace=4.0, wspace=2.0
    )
    ax = fig.add_subplot(gs[:10, :])
    ax_auto = fig.add_subplot(gs[10:, :22])
    ax_sex = fig.add_subplot(gs[10:, 22:])

    total = int(chr_ends[-1])
    autosome_len = int(chr_ends[21])

    # undetectable bins
    na_idx = np.nonzero(np.isnan(ratio))[0]
    ax.vlines(na_idx, lower, upper, color=LIGHT_GREY, lw=0.1, zorder=0)

    if bins.ref_gender == "F":
        _constitutional_lines(ax, 2, -total * 0.025, total * 1.025)
    else:
        _constitutional_lines(ax, 2, -total * 0.025, autosome_len)
        _constitutional_lines(ax, 1, autosome_len, total * 1.025)

    x = np.arange(total)
    ok = ~np.isnan(ratio)
    ax.scatter(
        x[ok], ratio[ok], c=colors[ok], s=dot_size[ok], zorder=4,
        edgecolors="none",
    )
    _draw_segments(ax, segments, chr_starts, colors, dot_size)
    _draw_gene_labels(ax, gene_labels, ratio)

    for xb in np.concatenate([[0], chr_ends]):
        ax.axvline(xb, color=BLACK, lw=0.8, ls=":", zorder=1)
    mids = chr_ends - np.diff(np.concatenate([[0], chr_ends])) / 2
    ax.set_xticks(mids)
    ax.set_xticklabels(
        [_chr_label(c) for c in range(n_chr)], rotation=45, fontsize=8
    )
    ax.set_ylim(lower, upper)
    ax.set_xlim(-total * 0.01, total * 1.01)
    ax.set_ylabel(r"log$_2$(ratio)")
    handles = [
        plt.Line2D([], [], color=COLOR_C, marker="o", ls="", label="Gain"),
        plt.Line2D([], [], color=COLOR_B, marker="o", ls="", label="Loss"),
        plt.Line2D(
            [], [], color=COLOR_C, ls=":", label="Constitutional 3n"
        ),
        plt.Line2D(
            [], [], color=COLOR_A, ls=":", label="Constitutional 2n"
        ),
        plt.Line2D(
            [], [], color=COLOR_B, ls=":", label="Constitutional 1n"
        ),
    ]
    ax.legend(
        handles=handles, loc="upper center", ncol=5, frameon=False,
        fontsize=8, title=f"Number of reads: {bins.n_reads:,}".replace(
            ",", "."
        ),
        title_fontsize=8,
    )
    if plot_title:
        fig.suptitle(plot_title, color=COLOR_A)

    # boxplots
    per_chr = [
        ratio[chr_starts[c] : chr_ends[c]] for c in range(n_chr)
    ]
    per_chr = [v[~np.isnan(v)] for v in per_chr]
    auto_data = per_chr[:22]
    ax_auto.boxplot(
        [v if len(v) else [0] for v in auto_data],
        flierprops={"marker": ".", "markersize": 2},
    )
    finite_l = l_whis[:22][np.isfinite(l_whis[:22])]
    finite_h = h_whis[:22][np.isfinite(h_whis[:22])]
    if len(finite_l) and len(finite_h):
        ax_auto.set_ylim(finite_l.min(), finite_h.max())
    ax_auto.set_xticklabels(
        [_chr_label(c) for c in range(22)], rotation=45, fontsize=7
    )
    ax_auto.set_ylabel(r"log$_2$(ratio)")
    _constitutional_lines(ax_auto, 2, 0, 23)

    sex_data = per_chr[22:]
    ax_sex.boxplot(
        [v if len(v) else [0] for v in sex_data],
        flierprops={"marker": ".", "markersize": 2},
    )
    ax_sex.set_xticklabels(
        [_chr_label(c) for c in range(22, n_chr)], rotation=45, fontsize=7
    )
    ploidy_sex = 1 if bins.ref_gender == "M" else 2
    _constitutional_lines(
        ax_sex, ploidy_sex, 0.5, len(sex_data) + 0.5
    )

    fig.savefig(os.path.join(out_dir, "genome_wide.png"))
    plt.close(fig)


def _plot_chromosome(
    out_dir, c, bins, segments, ratio, colors, dot_size, chr_starts,
    chr_ends, whiskers, ylim_override, gene_labels,
):
    lo_w, hi_w = whiskers
    if np.isnan(lo_w) or np.isnan(hi_w):
        return  # plotter.R:346-350 skips data-less chromosomes
    m0, m1 = int(chr_starts[c]), int(chr_ends[c])
    chr_ratio = ratio[m0:m1]

    upper = max(0.6 + hi_w, np.nanmax(chr_ratio))
    lower = min(-1.05 + lo_w, np.nanmin(chr_ratio))
    if ylim_override:
        lower, upper = ylim_override

    fig, ax = plt.subplots(figsize=(14, 10), dpi=120)
    ploidy = 1 if (c in (22, 23) and bins.ref_gender == "M") else 2
    _constitutional_lines(ax, ploidy, m0 - (m1 - m0) * 0.02,
                          m1 + (m1 - m0) * 0.02)

    na_idx = m0 + np.nonzero(np.isnan(chr_ratio))[0]
    ax.vlines(na_idx, lower, upper, color=(*COLOR_A, 0.6), lw=0.6, zorder=0)

    x = np.arange(m0, m1)
    ok = ~np.isnan(chr_ratio)
    ax.scatter(
        x[ok], chr_ratio[ok], c=colors[m0:m1][ok], s=dot_size[m0:m1][ok],
        zorder=4, edgecolors="none",
    )
    _draw_segments(
        ax, [s for s in segments if s[0] == c], chr_starts, colors, dot_size
    )
    _draw_gene_labels(
        ax,
        [g for g in gene_labels if m0 <= g[0] < m1],
        ratio,
    )

    n_bins = m1 - m0
    tick_bins = np.linspace(0, n_bins, 11)[1:-1]
    ax.set_xticks(m0 + tick_bins)
    ax.set_xticklabels(
        [f"{int(t * bins.binsize):,}".replace(",", ".") for t in tick_bins],
        rotation=45, fontsize=8,
    )
    ax.set_xlim(m0 - n_bins * 0.02, m1 + n_bins * 0.02)
    ax.set_ylim(lower, upper)
    ax.set_ylabel(r"log$_2$(ratio)")
    ax.set_title(_chr_label(c))
    fig.savefig(os.path.join(out_dir, f"{_chr_label(c)}.png"))
    plt.close(fig)
