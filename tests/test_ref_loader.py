"""Streamed reference loader: cached vs recomputed predict derivations
must be bit-identical, row-sliced stored-member reads must equal full
loads, and the loader-driven predict must equal the in-memory one."""

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.io import npz as io_npz
from wisecondorx_tpu.io.npz import load_member_rows, load_reference_npz
from wisecondorx_tpu.models.predictor import PredictConfig, predict_bins
from wisecondorx_tpu.models.ref_loader import ReferenceLoader
from wisecondorx_tpu.models.reference import NewrefConfig, build_reference
from wisecondorx_tpu.ops import normalize as norm_ops


@pytest.fixture(scope="module")
def built_reference(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("loader")
    sim = CohortSim(binsize=1e5, genome_scale=0.006, seed=41)
    samples, _ = sim.cohort(8, 7)
    passes, meta = build_reference(
        [(s, 100000) for s in samples],
        NewrefConfig(binsize=100000, refsize=25),
    )
    path = str(tmp / "ref.npz")
    io_npz.save_reference_npz(
        path, passes,
        is_nipt=meta["is_nipt"], trained_cutoff=meta["trained_cutoff"],
    )
    test_sample = sim.sample("F", cnvs=[(17, 1, 5, 3.0)])
    return path, passes, meta, test_sample


def test_caches_equal_recomputation(built_reference):
    path, passes, meta, _ = built_reference
    for gender, p in passes.items():
        dist = np.asarray(p["distances"])
        np.testing.assert_array_equal(
            p["wcx_weights"], norm_ops.get_weights(dist)
        )
        if gender == "A":
            for r in (1, 3, 5, 10):
                assert p["wcx_cutoffs"][r - 1] == norm_ops.get_optimal_cutoff(
                    dist, r
                )
        c5 = float(passes["A"]["wcx_cutoffs"][4])
        k = dist.shape[1]
        ok = np.unpackbits(p["wcx_distok"], axis=1, count=k).astype(bool)
        np.testing.assert_array_equal(
            ok, np.asarray(dist, np.float64) < c5
        )


def test_row_sliced_member_read(built_reference):
    path, passes, meta, _ = built_reference
    full = np.load(path, allow_pickle=True)
    for key in ("indexes", "distances", "indexes.F", "null_ratios"):
        if key not in full:
            continue
        want = full[key]
        for start in (0, 3, want.shape[0] - 1, want.shape[0] + 5):
            got = load_member_rows(path, key, start)
            np.testing.assert_array_equal(got, want[start:])


def test_loader_predict_equals_in_memory(built_reference):
    path, passes, meta, test_sample = built_reference
    cfg = PredictConfig(minrefbins=10, seed=7)
    ref_passes, ref_meta = load_reference_npz(path)
    want = predict_bins(test_sample, 100000, ref_passes, ref_meta, cfg)

    loader = ReferenceLoader(path)
    got = predict_bins(
        test_sample, 100000, loader.passes, loader.meta, cfg, loader=loader
    )
    assert got.ref_gender == want.ref_gender
    for c in range(len(want.results_r)):
        np.testing.assert_array_equal(got.results_r[c], want.results_r[c])
        np.testing.assert_array_equal(got.results_z[c], want.results_z[c])
        np.testing.assert_array_equal(got.results_w[c], want.results_w[c])
        np.testing.assert_array_equal(got.results_nr[c], want.results_nr[c])


def test_loader_uncached_reference_still_works(built_reference, tmp_path):
    """A reference without the wcx_* caches (e.g. built by the reference
    tool) takes the compute path and gives identical results."""
    path, passes, meta, test_sample = built_reference
    stripped = {
        g: {k: v for k, v in p.items() if not k.startswith("wcx_")}
        for g, p in passes.items()
    }
    bare = str(tmp_path / "bare.npz")
    io_npz.save_reference_npz(
        bare, stripped,
        is_nipt=meta["is_nipt"], trained_cutoff=meta["trained_cutoff"],
    )
    cfg = PredictConfig(minrefbins=10, seed=7)
    loader_c = ReferenceLoader(path)
    cached = predict_bins(
        test_sample, 100000, loader_c.passes, loader_c.meta, cfg,
        loader=loader_c,
    )
    loader_b = ReferenceLoader(bare)
    computed = predict_bins(
        test_sample, 100000, loader_b.passes, loader_b.meta, cfg,
        loader=loader_b,
    )
    for c in range(len(cached.results_r)):
        np.testing.assert_array_equal(
            cached.results_r[c], computed.results_r[c]
        )
        np.testing.assert_array_equal(
            cached.results_z[c], computed.results_z[c]
        )


def test_loader_nondefault_maskrepeats(built_reference):
    """--maskrepeats != 5 invalidates the bit-packed distok cache (it
    was built at depth 5): the loader must fall back to the distance
    table, use the cached cutoff SCHEDULE at the requested depth, and
    produce results identical to the fully computed path."""
    path, passes, meta, test_sample = built_reference
    cfg = PredictConfig(minrefbins=10, maskrepeats=3, seed=7)
    ref_passes, ref_meta = load_reference_npz(path)
    want = predict_bins(test_sample, 100000, ref_passes, ref_meta, cfg)
    loader = ReferenceLoader(path)
    got = predict_bins(
        test_sample, 100000, loader.passes, loader.meta, cfg, loader=loader
    )
    for c in range(len(want.results_r)):
        np.testing.assert_array_equal(got.results_r[c], want.results_r[c])
        np.testing.assert_array_equal(got.results_z[c], want.results_z[c])
    # And the cached schedule at depth 3 equals the direct computation.
    assert loader.cutoff() == norm_ops.get_optimal_cutoff(
        np.asarray(passes["A"]["distances"]), 3
    )


def test_load_reference_skip_distances(built_reference):
    """skip_distances_if_cached leaves the distance tables unloaded when
    the wcx_* caches cover them, and keeps them when caches are absent."""
    path, passes, meta, _ = built_reference
    cached, _ = load_reference_npz(path, skip_distances_if_cached=True)
    for g, p in cached.items():
        assert "distances" not in p, g
        assert "indexes" in p and "wcx_distok" in p

    full, _ = load_reference_npz(path)
    for g, p in full.items():
        assert "distances" in p, g

    # Without the caches the flag must be a no-op.
    import tempfile

    stripped = {
        g: {k: v for k, v in p.items() if not k.startswith("wcx_")}
        for g, p in passes.items()
    }
    import os

    with tempfile.TemporaryDirectory() as td:
        bare = os.path.join(td, "bare.npz")
        io_npz.save_reference_npz(
            bare, stripped,
            is_nipt=meta["is_nipt"], trained_cutoff=meta["trained_cutoff"],
        )
        bare_passes, _ = load_reference_npz(
            bare, skip_distances_if_cached=True
        )
        for g, p in bare_passes.items():
            assert "distances" in p, g


def test_maskrepeats_zero_means_no_masking(built_reference):
    """--maskrepeats 0 runs the reference's cutoff loop zero times, i.e.
    an infinite cutoff and no distance masking (reference
    predict_tools.py:74-82).  Round 4 regressed this two ways: the
    direct path raised IndexError on an empty schedule, and the cached
    paths silently indexed the deepest cached cutoff (advisor round-4
    medium finding).  The loader, the in-memory path, and the direct
    kernel must all agree — with every neighbour kept."""
    path, passes, meta, test_sample = built_reference
    dist = np.asarray(passes["A"]["distances"])
    assert norm_ops.get_optimal_cutoff(dist, 0) == float("inf")
    assert norm_ops.get_optimal_cutoff(dist, -1) == float("inf")

    cfg = PredictConfig(minrefbins=10, maskrepeats=0, seed=7)
    ref_passes, ref_meta = load_reference_npz(path)
    want = predict_bins(test_sample, 100000, ref_passes, ref_meta, cfg)
    loader = ReferenceLoader(path)
    got = predict_bins(
        test_sample, 100000, loader.passes, loader.meta, cfg, loader=loader
    )
    assert loader.cutoff() == float("inf")
    for c in range(len(want.results_r)):
        np.testing.assert_array_equal(got.results_r[c], want.results_r[c])
        np.testing.assert_array_equal(got.results_z[c], want.results_z[c])

    # The deepest cached cutoff (what the bug silently applied) masks
    # at least one neighbour on this reference, so 0 and 5 repeats are
    # genuinely distinguishable here.
    c5 = float(passes["A"]["wcx_cutoffs"][4])
    assert (np.asarray(dist, np.float64) >= c5).any()


def test_weights_cache_serves_at_nondefault_maskrepeats(
    built_reference, monkeypatch
):
    """wcx_weights is cutoff-independent, so it must serve at EVERY
    maskrepeats depth — only wcx_distok is pinned to depth 5.  Pinned
    behaviorally: with get_weights forbidden, a depth-3 loader predict
    still succeeds (and r4 would have recomputed ~10 s of host f64
    here)."""
    path, passes, meta, test_sample = built_reference

    def forbidden(*a, **k):
        raise AssertionError(
            "get_weights recomputed despite a cached wcx_weights"
        )

    monkeypatch.setattr(norm_ops, "get_weights", forbidden)
    cfg = PredictConfig(minrefbins=10, maskrepeats=3, seed=7)
    loader = ReferenceLoader(path)
    out = predict_bins(
        test_sample, 100000, loader.passes, loader.meta, cfg, loader=loader
    )
    assert any(np.isfinite(r).any() for r in out.results_r)


def test_maskrepeats_zero_skips_distance_load(built_reference, monkeypatch):
    """An infinite cutoff needs no distance compare and weights come
    from the cutoff-independent cache: at maskrepeats=0 on a cached
    reference, the loader must never read the distances member (a
    ~1 GB decompressed load at production scale)."""
    path, passes, meta, test_sample = built_reference

    orig = ReferenceLoader._member

    def guarded(self, gender, key, row_start=0):
        assert key != "distances", "distances loaded at maskrepeats=0"
        return orig(self, gender, key, row_start)

    monkeypatch.setattr(ReferenceLoader, "_member", guarded)
    cfg = PredictConfig(minrefbins=10, maskrepeats=0, seed=7)
    loader = ReferenceLoader(path)
    out = predict_bins(
        test_sample, 100000, loader.passes, loader.meta, cfg, loader=loader
    )
    assert loader.cutoff() == float("inf")
    assert any(np.isfinite(r).any() for r in out.results_r)


def test_upload_sentinel_packed_roundtrip():
    """The 3-byte packed sentinel upload is lossless across the value
    range real tables produce (incl. -1 sentinels and the 24-bit
    boundary), and out-of-range tables take the exact fallback."""
    from wisecondorx_tpu.models.ref_loader import upload_sentinel

    rng = np.random.default_rng(0)
    t = rng.integers(-1, (1 << 24) - 1, size=(37, 25)).astype(np.int32)
    t[0, :5] = [-1, 0, 1, (1 << 24) - 2, 12345]
    np.testing.assert_array_equal(np.asarray(upload_sentinel(t)), t)

    big = t.copy()
    big[1, 1] = 1 << 25  # beyond the packed range -> fallback
    np.testing.assert_array_equal(np.asarray(upload_sentinel(big)), big)
