"""Byte-parity of BED/statistics writers vs the reference's
predict_output.py, driven on identical in-memory results."""

import argparse
import copy

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.io import npz as io_npz
from wisecondorx_tpu.models.predictor import (
    PredictConfig,
    predict,
)
from wisecondorx_tpu.models.reference import NewrefConfig, build_reference
from wisecondorx_tpu.output.tables import generate_output_tables


@pytest.fixture(scope="module")
def predicted(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tables")
    sim = CohortSim(binsize=1e5, genome_scale=0.006, seed=41)
    samples, _ = sim.cohort(8, 7)
    passes, meta = build_reference(
        [(copy.deepcopy(s), 100000) for s in samples],
        NewrefConfig(binsize=100000, refsize=25, col_tile=128),
    )
    case = sim.sample("F", cnvs=[(12, 0, 4, 3.0)])
    cfg = PredictConfig(minrefbins=10, zscore=5)
    bins, segments = predict(
        copy.deepcopy(case), 100000, passes, meta, cfg
    )
    return tmp, bins, segments, cfg


def _reference_tables(ref_modules, tmp, bins, segments, cfg, outid):
    """Run the reference's writer functions on equivalent inputs."""
    import wisecondorx.predict_output as po

    # Reference consumes per-chr python lists and a rem_input dict.
    results = {
        "results_r": [list(map(float, r)) for r in bins.results_r],
        "results_z": [list(map(float, z)) for z in bins.results_z],
        "results_w": [list(map(float, w)) for w in bins.results_w],
        "results_nr": [
            [list(map(float, row)) for row in chrnr]
            for chrnr in bins.results_nr
        ],
        "results_c": [list(s) for s in segments],
    }
    rem_input = {
        "args": argparse.Namespace(
            outid=outid,
            beta=cfg.beta,
            zscore=cfg.zscore,
            regions=None,
        ),
        "binsize": bins.binsize,
        "n_reads": bins.n_reads,
        "ref_gender": bins.ref_gender,
        "gender": bins.gender,
        "bins_per_chr": np.asarray(bins.layout.bins_per_chr),
    }
    po.generate_output_tables(rem_input, results)


def test_tables_byte_parity(ref_modules, predicted):
    tmp, bins, segments, cfg = predicted
    import sys

    sys.path.insert(0, "/root/reference/src")

    ours_id = str(tmp / "ours")
    theirs_id = str(tmp / "theirs")
    generate_output_tables(ours_id, bins, segments, cfg)
    _reference_tables(ref_modules, tmp, bins, segments, cfg, theirs_id)

    for suffix in ("_bins.bed", "_segments.bed", "_aberrations.bed"):
        ours = open(ours_id + suffix).read()
        theirs = open(theirs_id + suffix).read()
        assert ours == theirs, f"{suffix} differs"

    # statistics: numeric comparison — the reference computes its z column
    # through np.ma reductions whose summation order differs in the last
    # float digit.
    ours_lines = open(ours_id + "_statistics.txt").read().strip().split("\n")
    ref_lines = open(theirs_id + "_statistics.txt").read().strip().split("\n")
    assert len(ours_lines) == len(ref_lines)
    for ol, rl in zip(ours_lines, ref_lines):
        of, rf = ol.split("\t"), rl.split("\t")
        assert len(of) == len(rf)
        for a, b in zip(of, rf):
            try:
                np.testing.assert_allclose(float(a), float(b), rtol=1e-9)
            except ValueError:
                assert a == b


def test_tables_beta_mode(ref_modules, predicted):
    tmp, bins, segments, _ = predicted
    cfg = PredictConfig(minrefbins=10, beta=0.3)
    ours_id = str(tmp / "ours_beta")
    theirs_id = str(tmp / "theirs_beta")
    generate_output_tables(ours_id, bins, segments, cfg)
    _reference_tables(ref_modules, tmp, bins, segments, cfg, theirs_id)
    for suffix in ("_segments.bed", "_aberrations.bed"):
        assert (
            open(ours_id + suffix).read()
            == open(theirs_id + suffix).read()
        ), suffix
