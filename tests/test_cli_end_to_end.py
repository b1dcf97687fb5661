"""End-to-end CLI test: convert-npz cohort -> newref -> gender/predict with
BED + plot outputs, checking the planted trisomy is called."""

import copy
import os

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.cli import main as cli_main
from wisecondorx_tpu.io import npz as io_npz

CNV = (18, 1, 5, 3.0)  # trisomy-like gain on chr18


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    sim = CohortSim(binsize=1e5, genome_scale=0.006, seed=99)
    samples, _ = sim.cohort(8, 7)
    infiles = []
    for i, s in enumerate(samples):
        path = tmp / f"control_{i}.npz"
        io_npz.save_sample_npz(path, 100000, s, {"mapped": 1})
        infiles.append(str(path))
    test_sample = sim.sample("M", cnvs=[CNV])
    test_path = tmp / "case.npz"
    io_npz.save_sample_npz(test_path, 100000, test_sample, {"mapped": 1})
    return tmp, infiles, str(test_path)


def test_cli_newref_and_predict(workdir):
    tmp, infiles, test_path = workdir
    ref_path = str(tmp / "reference.npz")

    cli_main(["newref", *infiles, ref_path, "--refsize", "25"])
    assert os.path.exists(ref_path)

    outid = str(tmp / "case")
    cli_main(
        [
            "predict", test_path, ref_path, outid,
            "--minrefbins", "10", "--bed", "--plot",
        ]
    )

    for suffix in ("_bins.bed", "_segments.bed", "_aberrations.bed",
                   "_statistics.txt"):
        assert os.path.exists(outid + suffix), suffix

    aberrations = open(outid + "_aberrations.bed").read().strip().split("\n")
    gains = [l for l in aberrations[1:] if l.endswith("gain")]
    assert any(l.split("\t")[0] == str(CNV[0]) for l in gains), aberrations

    plots = os.listdir(outid + ".plots")
    assert "genome_wide.png" in plots
    # chrY may legitimately be skipped when fully masked (plotter.R:346-350)
    assert "chr1.png" in plots and "chrX.png" in plots

    # bins.bed structure: header + one row per bin, "nan" for zeroed bins
    lines = open(outid + "_bins.bed").read().strip().split("\n")
    assert lines[0] == "chr\tstart\tend\tid\tratio\tzscore"
    first = lines[1].split("\t")
    assert first[0] == "1" and first[1] == "1"


def test_cli_gender(workdir, capsys):
    tmp, infiles, test_path = workdir
    ref_path = str(tmp / "reference.npz")
    cli_main(["gender", test_path, ref_path])
    assert capsys.readouterr().out.strip() == "male"


def test_cli_predict_requires_output_format(workdir):
    tmp, infiles, test_path = workdir
    ref_path = str(tmp / "reference.npz")
    with pytest.raises(SystemExit):
        cli_main(["predict", test_path, ref_path, str(tmp / "x")])
