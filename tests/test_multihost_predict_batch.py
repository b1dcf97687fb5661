"""Two-process predict-batch test (VERDICT r2 next-round #9): the DCN
sample-sharding path of ``predict-batch`` (cli.py) exercised across real
OS processes, not degenerately in one.

Two workers initialize jax.distributed against a local coordinator (2
virtual CPU devices each), run the ``predict-batch`` CLI on the same
4-sample plate, and between them must produce ALL four samples' outputs
(shard_files gives each process a disjoint half), each byte-identical to
a single-process predict-batch run of the full plate."""

import os
import socket
import subprocess
import sys

import pytest

from synthetic import CohortSim
from wisecondorx_tpu.cli import main as cli_main
from wisecondorx_tpu.io import npz as io_npz

WORKER = r"""
import os, sys

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from wisecondorx_tpu.cli import main

ref, outdir = sys.argv[4], sys.argv[5]
infiles = sys.argv[6:]
main([
    "predict-batch", ref, outdir, "--bed", "--minrefbins", "10",
    "--infiles", *infiles,
])
print("WORKER_OK", pid, flush=True)
"""


@pytest.fixture(scope="module")
def plate(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh_batch")
    sim = CohortSim(binsize=1e5, genome_scale=0.006, seed=31)
    samples, _ = sim.cohort(7, 6)
    infiles = []
    for i, s in enumerate(samples):
        p = tmp / f"control_{i}.npz"
        io_npz.save_sample_npz(p, 100000, s, {"mapped": 1})
        infiles.append(str(p))
    ref_path = str(tmp / "reference.npz")
    cli_main(["newref", *infiles, ref_path, "--refsize", "25"])
    cases = []
    for i in range(4):
        s = sim.sample("F", cnvs=[(18, 1, 5, 3.0)] if i == 0 else None)
        p = tmp / f"case_{i}.npz"
        io_npz.save_sample_npz(p, 100000, s, {"mapped": 1})
        cases.append(str(p))
    return tmp, ref_path, cases


def test_two_process_predict_batch(plate, tmp_path):
    tmp, ref_path, cases = plate

    # Single-process oracle over the full plate.
    solo_dir = str(tmp_path / "solo")
    cli_main(
        ["predict-batch", ref_path, solo_dir, "--bed",
         "--minrefbins", "10", "--infiles", *cases]
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    mh_dir = str(tmp_path / "mh")
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [p for p in sys.path if p]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p), "2", str(port),
             ref_path, mh_dir, *cases],
            env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for p in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)
    assert all("WORKER_OK" in lg for lg in logs)

    # Between them, the two processes cover the whole plate, and every
    # output file is byte-identical to the single-process run.
    for case in cases:
        base = os.path.basename(case)[:-4]
        for suffix in ("_bins.bed", "_segments.bed", "_aberrations.bed",
                       "_statistics.txt"):
            mh = os.path.join(mh_dir, base + suffix)
            solo = os.path.join(solo_dir, base + suffix)
            assert os.path.exists(mh), f"{base}{suffix} missing"
            assert open(mh).read() == open(solo).read(), f"{base}{suffix}"
