"""Real multi-process multihost test (VERDICT round-1 gap: the DCN layer
was only exercised degenerately, in one process).

Two OS processes initialize jax.distributed against a local coordinator
(2 virtual CPU devices each -> 4 global), run the multihost KNN row
fan-out on identically-regenerated data, and every process must end up
with the full, bit-identical result after the cross-process all-gather —
equal to the single-process search."""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = r"""
import os, sys
import numpy as np

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

from wisecondorx_tpu.parallel.multihost import maybe_initialize_distributed

pidx, pcount = maybe_initialize_distributed()
assert pcount == nproc, f"distributed init failed: {pcount}"
assert len(jax.devices()) == 2 * nproc, len(jax.devices())

# Identical data in every process (the stage regenerates per host from
# the same input files).
rng = np.random.default_rng(42)
bins_per_chr = np.array([300, 250, 200])
starts = np.concatenate([[0], np.cumsum(bins_per_chr)[:-1]])
chr_of = np.repeat(np.arange(3), bins_per_chr).astype(np.int32)
data = rng.lognormal(0, 0.02, size=(int(bins_per_chr.sum()), 12))

from wisecondorx_tpu.parallel.multihost import knn_search_multihost

idx, dist = knn_search_multihost(
    data, chr_of, starts, bins_per_chr, ref_size=17, col_tile=128
)
np.savez(sys.argv[4], idx=idx, dist=dist)
print("WORKER_OK", pidx, flush=True)
"""


def test_two_process_multihost_knn(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    outs = [tmp_path / f"out{p}.npz" for p in range(2)]
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
             str(outs[p])],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for p in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)
    assert all("WORKER_OK" in lg for lg in logs)

    # Single-process oracle on the same data.
    from wisecondorx_tpu.ops import knn as knn_ops

    rng = np.random.default_rng(42)
    bins_per_chr = np.array([300, 250, 200])
    starts = np.concatenate([[0], np.cumsum(bins_per_chr)[:-1]])
    chr_of = np.repeat(np.arange(3), bins_per_chr).astype(np.int32)
    data = rng.lognormal(0, 0.02, size=(int(bins_per_chr.sum()), 12))
    idx_s, dist_s = knn_ops.knn_search(
        data, chr_of, starts, bins_per_chr, ref_size=17, col_tile=128,
        merge_method="sort",
    )

    for out in outs:
        got = np.load(out)
        np.testing.assert_array_equal(got["idx"], idx_s)
        np.testing.assert_array_equal(got["dist"], dist_s)
