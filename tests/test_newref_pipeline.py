"""End-to-end newref parity: our build_reference vs the reference's
prep/part/post/merge chain run in a tmpdir."""

import argparse
import copy
import functools
import random

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.io import npz as io_npz
from wisecondorx_tpu.models.reference import NewrefConfig, build_reference
from wisecondorx_tpu.ops.gmm import train_gender_model

SEED = 1234
REFSIZE = 25


@pytest.fixture(scope="module")
def cohort():
    sim = CohortSim(binsize=1e5, genome_scale=0.006, seed=21)
    return sim.cohort(8, 7)


def _run_reference_newref(ref, tmp_path, samples, genders, cutoff, nipt=False):
    """Replicates reference main.py:40-137 using the reference's own
    functions, with genders/cutoff injected (the GMM is tested separately)
    and PCA pinned to the deterministic full-SVD solver."""
    from sklearn.decomposition import PCA

    nt, nc = ref["newref_tools"], ref["newref_control"]
    orig_pca = nt.PCA
    nt.PCA = functools.partial(PCA, svd_solver="full")
    try:
        samples = [copy.deepcopy(s) for s in samples]
        for i, s in enumerate(samples):
            samples[i] = ref["overall_tools"].gender_correct(s, genders[i])
        samples = np.array(samples)

        total_mask, bins_per_chr = nt.get_mask(samples)
        genders_arr = np.array(genders)
        if genders.count("F") > 4:
            mask_f, _ = nt.get_mask(samples[genders_arr == "F"])
            total_mask = total_mask & mask_f
        if genders.count("M") > 4 and not nipt:
            mask_m, _ = nt.get_mask(samples[genders_arr == "M"])
            total_mask = total_mask & mask_m

        args = argparse.Namespace(
            binsize=100000,
            refsize=REFSIZE,
            nipt=nipt,
            prepfile=str(tmp_path / "prep.npz"),
            prepdatafile=str(tmp_path / "prep_data.npy"),
            partfile=str(tmp_path / "part"),
            outfile=str(tmp_path / "ref.npz"),
        )

        outfiles = []
        plan = [("A", np.ones(len(genders), dtype=bool))]
        if genders.count("F") > 4:
            plan.append(("F", genders_arr == "F"))
        if genders.count("M") > 4 and not nipt:
            plan.append(("M", genders_arr == "M"))

        random.seed(SEED)
        for gender, cols in plan:
            args.tmpoutfile = str(tmp_path / f"tmp.{gender}.npz")
            outfiles.append(args.tmpoutfile)
            nc.tool_newref_prep(
                args, samples[cols], gender, total_mask, bins_per_chr
            )
            args.part = [1, 1]
            pca_corrected_data = np.load(args.prepdatafile)
            nc._tool_newref_part(args, pca_corrected_data)
            nc.tool_newref_post(args, 1)

        nc.tool_newref_merge(args, outfiles, cutoff)
        return args.outfile
    finally:
        nt.PCA = orig_pca


def test_newref_matches_reference(ref_modules, cohort, tmp_path):
    samples, true_genders = cohort

    genders, cutoff, _ = train_gender_model(samples)
    assert genders == true_genders

    ref_path = _run_reference_newref(
        ref_modules, tmp_path, samples, genders, cutoff
    )

    # Replicate the reference's global-random-stream null-sample draws.
    random.seed(SEED)
    n_per_pass = {
        "A": len(genders),
        "F": genders.count("F"),
        "M": genders.count("M"),
    }
    draws = {
        g: np.array(random.sample(range(n_per_pass[g]), min(n_per_pass[g], 100)))
        for g in ("A", "F", "M")
    }

    passes, meta = build_reference(
        [(copy.deepcopy(s), 100000) for s in samples],
        NewrefConfig(binsize=100000, refsize=REFSIZE, col_tile=128),
        _null_chooser=lambda g, n: draws[g],
    )
    ours_path = tmp_path / "ours.npz"
    io_npz.save_reference_npz(
        ours_path, passes, is_nipt=meta["is_nipt"], trained_cutoff=cutoff
    )

    theirs = np.load(ref_path, allow_pickle=True, encoding="latin1")
    ours = np.load(ours_path, allow_pickle=True, encoding="latin1")

    # Schema parity: every reference key is present; the only additions
    # are the wcx_* predict caches (extra members the reference ignores).
    extras = set(ours.keys()) - set(theirs.keys())
    assert set(theirs.keys()) <= set(ours.keys())
    assert all(k.split(".")[0].startswith("wcx_") for k in extras), extras
    for key in theirs.keys():
        t, o = theirs[key], ours[key]
        if key.startswith("indexes"):
            np.testing.assert_array_equal(o, t, err_msg=key)
        elif key.startswith("pca_components"):
            # PCA component rows are sign-ambiguous; projection (the only
            # consumer, predict_tools.py:56-65) is sign-invariant.
            signs = np.sign(np.sum(np.asarray(o) * np.asarray(t), axis=1))
            np.testing.assert_allclose(
                np.asarray(o) * signs[:, None], t, rtol=1e-6, atol=1e-10,
                err_msg=key,
            )
        elif key.startswith(("distances", "null_ratios", "pca_")):
            np.testing.assert_allclose(
                o, t, rtol=1e-6, atol=1e-10, err_msg=key
            )
        elif key.startswith(("mask", "bins_per_chr", "masked_bins")):
            np.testing.assert_array_equal(o, t, err_msg=key)
        else:  # scalars: binsize, has_*, is_nipt, trained_cutoff
            assert np.asarray(o).item() == pytest.approx(
                np.asarray(t).item()
            ), key


def test_newref_too_few_samples(cohort):
    samples, _ = cohort
    from wisecondorx_tpu.models.reference import NewrefError

    # 5F + 4M: the sex model still resolves, but the sample-count check
    # (reference main.py:98-102) must reject the build.
    with pytest.raises(NewrefError, match="at least 10 samples"):
        build_reference(
            [(copy.deepcopy(s), 100000) for s in samples[3:12]],
            NewrefConfig(binsize=100000, refsize=10, col_tile=128),
        )


def test_daemon_future_propagates_errors():
    """The pipelined search wrapper re-raises worker exceptions in
    result() and never blocks interpreter exit (daemon thread)."""
    import pytest

    from wisecondorx_tpu.models.reference import _DaemonFuture

    ok = _DaemonFuture(lambda: 42, name="t-ok")
    assert ok.result() == 42

    boom = _DaemonFuture(
        lambda: (_ for _ in ()).throw(RuntimeError("search died")),
        name="t-bad",
    )
    with pytest.raises(RuntimeError, match="search died"):
        boom.result()


def test_predict_consumes_reference_tool_npz(ref_modules, cohort, tmp_path):
    """Full interchange: OUR predict (streamed loader AND in-memory)
    consuming the npz the REFERENCE tool's own prep/part/post/merge
    chain wrote — deflated members, its dtype/pickling choices, no
    wcx_* caches.  The loader's row-sliced member reads must cope with
    the reference writer's compressed members, results must match the
    in-memory path bit-for-bit, and the planted CNV must be called."""
    from wisecondorx_tpu.io.npz import load_reference_npz
    from wisecondorx_tpu.models.predictor import (
        PredictConfig,
        predict_bins,
        segment_bins,
    )
    from wisecondorx_tpu.models.ref_loader import ReferenceLoader

    samples, true_genders = cohort
    genders, cutoff, _ = train_gender_model(samples)
    ref_path = _run_reference_newref(
        ref_modules, tmp_path, samples, genders, cutoff
    )

    sim = CohortSim(binsize=1e5, genome_scale=0.006, seed=21)
    test_sample = sim.sample("F", cnvs=[(11, 1, 10, 3.0)])

    cfg = PredictConfig(minrefbins=10, seed=7)
    ref_passes, ref_meta = load_reference_npz(ref_path)
    mem = predict_bins(
        dict(test_sample), 100000, ref_passes, ref_meta, cfg
    )
    loader = ReferenceLoader(ref_path)
    via_loader = predict_bins(
        dict(test_sample), 100000, loader.passes, loader.meta, cfg,
        loader=loader,
    )
    for c in range(len(mem.results_r)):
        np.testing.assert_array_equal(
            mem.results_r[c], via_loader.results_r[c], err_msg=str(c)
        )
        np.testing.assert_array_equal(
            mem.results_z[c], via_loader.results_z[c], err_msg=str(c)
        )

    segments = segment_bins(mem, cfg)
    # The planted gain on chromosome index 10 (chr11) shows up as a
    # clearly elevated segment (split out or whole-chromosome).
    chr11 = [row for row in segments if row[0] == 10]
    assert chr11 and max(row[4] for row in chr11) > 0.25, segments
