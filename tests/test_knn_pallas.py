"""Tests for the fused Pallas KNN kernel (interpret mode on CPU).

The Pallas path is the TPU production default (f32, centered + rescaled
working data, bucketed in-VMEM top-k with drop-certificate verification).
These tests run the kernel through the Pallas interpreter against the
float64 "sort" oracle — the path that is itself parity-tested against the
reference's bisect loop in test_knn.py.
"""

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.genome import MaskedLayout, samples_to_matrix
from wisecondorx_tpu.ops import knn as knn_ops
from wisecondorx_tpu.ops import mask as mask_ops
from wisecondorx_tpu.ops import pca as pca_ops
from wisecondorx_tpu.ops.knn import SENTINEL_DISTANCE
from wisecondorx_tpu.ops.knn_pallas import knn_search_pallas

# Small kernel geometry so interpret mode stays fast.
GEOM = dict(lanes=128, depth=4, row_tile=64, row_chunk=1024, interpret=True)


def _layout(bins_per_chr):
    bins_per_chr = np.asarray(bins_per_chr)
    starts = np.concatenate([[0], np.cumsum(bins_per_chr)[:-1]]).astype(
        np.int64
    )
    chr_of_bin = np.repeat(
        np.arange(len(bins_per_chr)), bins_per_chr
    ).astype(np.int32)
    return starts, chr_of_bin


def _sort_oracle(data, chr_of_bin, starts, sizes, ref_size, row_range=None):
    return knn_ops.knn_search(
        data,
        chr_of_bin,
        starts,
        sizes,
        ref_size=ref_size,
        row_range=row_range,
        col_tile=128,
        merge_method="sort",
    )


def test_integer_exact_match():
    """On small-integer data f32 arithmetic is exact, so the Pallas result
    must equal the f64 sort oracle bit-for-bit (as sets; tie order at the
    k boundary is unspecified for the bucket path, so compare sorted)."""
    rng = np.random.default_rng(7)
    bins_per_chr = [400, 350, 274]
    starts, chr_of_bin = _layout(bins_per_chr)
    n = int(sum(bins_per_chr))
    data = rng.integers(0, 8, size=(n, 16)).astype(np.float64)

    idx_s, dist_s = _sort_oracle(data, chr_of_bin, starts, bins_per_chr, 20)
    # k+1 oracle: a row's top-20 SET is unique iff the 21st smallest
    # distance strictly exceeds the 20th.
    _, dist_s21 = _sort_oracle(data, chr_of_bin, starts, bins_per_chr, 21)
    stats = {}
    idx_p, dist_p = knn_search_pallas(
        data, chr_of_bin, starts, bins_per_chr, ref_size=20,
        _stats=stats, **GEOM,
    )
    # Integer squared distances: centering/scaling round-trips are not
    # exactly integral, so compare with a tight tolerance.
    np.testing.assert_allclose(
        np.sort(dist_p, axis=1).astype(np.float64),
        np.sort(dist_s, axis=1),
        rtol=1e-5,
        atol=1e-5,
    )
    # Where the boundary is not tied, index sets must agree exactly.
    s21 = np.sort(dist_s21, axis=1)
    unique_set = s21[:, 20] > s21[:, 19]
    for r in np.nonzero(unique_set)[0]:
        assert set(idx_p[r]) == set(idx_s[r]), f"row {r}"


def test_bucket_collision_flag_and_rerun():
    """> depth duplicates of the target vector in ONE residue class mod
    `lanes` on other chromosomes: the bucket provably cannot hold them all,
    the drop certificate must flag the row, and the exact re-run must
    recover every zero-distance neighbour."""
    rng = np.random.default_rng(3)
    bins_per_chr = [400, 350, 274]
    starts, chr_of_bin = _layout(bins_per_chr)
    n = int(sum(bins_per_chr))
    data = rng.integers(0, 8, size=(n, 16)).astype(np.float64)
    target = 5
    clones = list(range(405, n, 128))  # chr1/chr2, all = 21 mod 128
    assert len(clones) > GEOM["depth"]
    for c in clones:
        data[c] = data[target]

    idx_s, dist_s = _sort_oracle(data, chr_of_bin, starts, bins_per_chr, 20)
    stats = {}
    idx_p, dist_p = knn_search_pallas(
        data, chr_of_bin, starts, bins_per_chr, ref_size=20,
        _stats=stats, **GEOM,
    )
    assert stats["flagged_rows"] >= 1
    assert (dist_p[target] == 0).sum() == len(clones)
    assert (dist_s[target] == 0).sum() == len(clones)
    np.testing.assert_allclose(
        np.sort(dist_p, axis=1).astype(np.float64),
        np.sort(dist_s, axis=1),
        rtol=1e-5,
        atol=1e-5,
    )


def test_xla_partial_merge_matches_sort():
    """The XLA "partial" (approx_max_k) merge must equal "sort" on
    tie-free data — it is the fast-compiling exact fallback when the
    Pallas path is unavailable."""
    rng = np.random.default_rng(11)
    bins_per_chr = [300, 250, 200]
    starts, chr_of_bin = _layout(bins_per_chr)
    n = int(sum(bins_per_chr))
    data = rng.lognormal(0, 0.02, size=(n, 24))

    idx_s, dist_s = _sort_oracle(data, chr_of_bin, starts, bins_per_chr, 25)
    idx_m, dist_m = knn_ops.knn_search(
        data, chr_of_bin, starts, bins_per_chr, ref_size=25,
        col_tile=128, merge_method="partial",
    )
    np.testing.assert_allclose(
        np.sort(dist_m, axis=1), np.sort(dist_s, axis=1), rtol=1e-12
    )
    for r in range(n):
        assert set(idx_m[r]) == set(idx_s[r])


def test_realistic_cohort_agreement():
    """PCA-corrected cohort data (the production distribution): the f32
    Pallas path must agree with the f64 oracle on >= 99% of neighbours and
    on distance values to ~1e-3 relative."""
    sim = CohortSim(binsize=1e5, genome_scale=0.01, seed=11)
    samples, _ = sim.cohort(8, 6)
    matrix, layout = samples_to_matrix(samples)
    m = mask_ops.get_mask(matrix)
    tl = layout.truncated(22)
    tm = m[: tl.total_bins]
    normed = np.asarray(mask_ops.depth_normalize(matrix[: tl.total_bins]))
    corrected, _, _ = pca_ops.train_pca(normed[tm])
    ml = MaskedLayout(tl, tm)

    ref_size = 40
    idx_s, dist_s = _sort_oracle(
        corrected, ml.chr_of_masked_bin, ml.masked_chr_starts,
        ml.masked_bins_per_chr, ref_size,
    )
    idx_p, dist_p = knn_search_pallas(
        corrected, ml.chr_of_masked_bin, ml.masked_chr_starts,
        ml.masked_bins_per_chr, ref_size=ref_size, **GEOM,
    )
    n = corrected.shape[0]
    agree = np.mean(
        [len(np.intersect1d(a, b)) for a, b in zip(idx_s, idx_p)]
    ) / ref_size
    assert agree > 0.99, f"neighbour agreement {agree:.4f}"
    rel = np.abs(
        np.sort(dist_p, axis=1).astype(np.float64) - np.sort(dist_s, axis=1)
    ) / np.maximum(np.sort(dist_s, axis=1), 1e-300)
    assert np.median(rel) < 1e-4
    assert np.max(rel) < 5e-2


def test_gonosome_row_range():
    rng = np.random.default_rng(23)
    bins_per_chr = [500, 400, 128]
    starts, chr_of_bin = _layout(bins_per_chr)
    n = int(sum(bins_per_chr))
    data = rng.integers(0, 8, size=(n, 16)).astype(np.float64)
    rr = (900, n)

    idx_s, dist_s = _sort_oracle(
        data, chr_of_bin, starts, bins_per_chr, 15, row_range=rr
    )
    idx_p, dist_p = knn_search_pallas(
        data, chr_of_bin, starts, bins_per_chr, ref_size=15,
        row_range=rr, **GEOM,
    )
    assert idx_p.shape == (n - 900, 15)
    np.testing.assert_allclose(
        np.sort(dist_p, axis=1).astype(np.float64),
        np.sort(dist_s, axis=1),
        rtol=1e-5, atol=1e-5,
    )


def test_unfilled_slots_sentinels():
    """ref_size > candidate pool: unfilled slots must be -1 / 1e10."""
    rng = np.random.default_rng(5)
    bins_per_chr = [40, 30, 20]
    starts, chr_of_bin = _layout(bins_per_chr)
    n = int(sum(bins_per_chr))
    data = rng.integers(0, 8, size=(n, 8)).astype(np.float64)
    ref_size = n  # > any row's other-chromosome pool

    idx_s, dist_s = _sort_oracle(data, chr_of_bin, starts, bins_per_chr, n)
    idx_p, dist_p = knn_search_pallas(
        data, chr_of_bin, starts, bins_per_chr, ref_size=ref_size, **GEOM,
    )
    assert (idx_p == -1).any()
    np.testing.assert_array_equal(idx_p == -1, idx_s == -1)
    np.testing.assert_array_equal(
        dist_p == SENTINEL_DISTANCE, dist_s == SENTINEL_DISTANCE
    )


def test_empty_row_range():
    idx, dist = knn_search_pallas(
        np.ones((10, 4)), np.zeros(10, np.int32), [0], [10],
        ref_size=5, row_range=(10, 10), **GEOM,
    )
    assert idx.shape == (0, 5)


def test_overlap_chunk_plan_and_device_out():
    """n_rows that is not a chunk multiple: the final chunk re-covers the
    tail from n_rows - row_chunk with ONE kernel shape (the cold-process
    compile-tax fix); the device-resident index output must equal the host
    result, including rows corrected by the collision re-run."""
    import jax.numpy as jnp

    from wisecondorx_tpu.ops.knn_pallas import _chunk_plan

    rng = np.random.default_rng(31)
    bins_per_chr = [700, 500, 324]
    starts, chr_of_bin = _layout(bins_per_chr)
    n = int(sum(bins_per_chr))  # 1524 rows > row_chunk=1024 -> overlap
    data = rng.integers(0, 8, size=(n, 16)).astype(np.float64)
    # Plant a bucket collision so the rerun path fires and its correction
    # must be patched into the device copy too.
    target = 5
    clones = list(range(709, n, 128))
    assert len(clones) > GEOM["depth"]
    for c in clones:
        data[c] = data[target]

    plan = _chunk_plan(n, 0, 1536, GEOM["row_tile"], GEOM["row_chunk"])
    assert [p[3] for p in plan] == [1024, 1024]  # one compiled shape
    assert plan[1] == (1024, 1524, 500, 1024, 524)  # tail re-covered

    idx_s, dist_s = _sort_oracle(data, chr_of_bin, starts, bins_per_chr, 20)
    stats, dev_out = {}, {}
    idx_p, dist_p = knn_search_pallas(
        data, chr_of_bin, starts, bins_per_chr, ref_size=20,
        _stats=stats, _device_out=dev_out, **GEOM,
    )
    assert stats["flagged_rows"] >= 1
    np.testing.assert_allclose(
        np.sort(dist_p, axis=1).astype(np.float64),
        np.sort(dist_s, axis=1), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(dev_out["indexes"]), idx_p)

    # A caller-pinned larger n_pad (the planned pre-filter padding) must
    # not change results.
    idx_p2, dist_p2 = knn_search_pallas(
        data, chr_of_bin, starts, bins_per_chr, ref_size=20,
        n_pad=2048, **GEOM,
    )
    np.testing.assert_array_equal(dist_p2, dist_p)
    # jnp import used above keeps the device arrays alive explicitly.
    del jnp


def test_null_ratios_device_matches_host():
    """The all-device null-ratio driver must reproduce the host table,
    including the -1 wraparound quirk and gonosomal placeholder rows."""
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    n, s, k = 700, 12, 9
    data = rng.lognormal(0, 0.1, size=(n, s))
    idx = rng.integers(0, n, size=(n, k)).astype(np.int32)
    idx[3, :4] = -1  # sentinel slots -> numpy wraparound parity
    chosen = np.array([0, 2, 5, 7])

    host = knn_ops.compute_null_ratios(data, idx, chosen, backend="numpy")
    dev = knn_ops.compute_null_ratios_device(
        jnp.asarray(data), jnp.asarray(idx), chosen
    )
    np.testing.assert_allclose(dev, host, rtol=1e-12)

    # Gonosomal shape: placeholder zero-index rows prepended on device.
    r0 = 300
    idx_g = idx.copy()
    idx_g[:r0] = 0
    host_g = knn_ops.compute_null_ratios(
        data, idx_g, chosen, backend="numpy"
    )
    dev_g = knn_ops.compute_null_ratios_device(
        jnp.asarray(data), jnp.asarray(idx[r0:]), chosen,
        placeholder_rows=r0,
    )
    np.testing.assert_allclose(dev_g, host_g, rtol=1e-12)


def test_warmup_runs_on_cpu_interpreter():
    """The warm-up driver actually runs the full _warm_only hot path
    (synthetic device cohort -> PCA -> Pallas dispatch incl. the planted
    collision's exact re-run -> device null-ratio programs), forced on
    through the Pallas interpreter, so the warm branches have coverage."""
    from wisecondorx_tpu.utils import warmup

    # Synchronous (raises on error, unlike the best-effort thread): the
    # autosomal shape with the device null-ratio warm...
    warmup.warm_newref_pass(
        256, 8, ref_size=10, n_chr=3, interpret=True
    )
    # ...and a gonosomal shape without it (the checkpointed-build plan).
    warmup.warm_newref_pass(
        256, 8, ref_size=10, n_chr=3, gonosome_rows=60,
        null_warm=False, interpret=True,
    )
    # The threaded driver path.
    done = warmup.start_warmup(
        [dict(n_bins=256, n_samples=8, ref_size=10, n_chr=3,
              interpret=True)],
        enabled=True,
    )
    assert done.wait(300)
