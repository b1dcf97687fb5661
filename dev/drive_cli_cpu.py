"""CPU end-to-end CLI drive (verify): synthetic cohort -> newref ->
predict --bed --plot -> predict-batch, through the real CLI entry."""

import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo/tests")
from synthetic import CohortSim  # noqa: E402

from wisecondorx_tpu.cli import main  # noqa: E402
from wisecondorx_tpu.io.npz import save_sample_npz  # noqa: E402

tmp = tempfile.mkdtemp(prefix="wcx_drive_")
sim = CohortSim(seed=11)
files = []
for i in range(12):
    s = sim.sample(gender="F" if i % 2 else "M")
    p = os.path.join(tmp, f"s{i}.npz")
    save_sample_npz(p, sim.binsize, s, {"filter_rmdup": 0})
    files.append(p)

ref = os.path.join(tmp, "ref.npz")
main(["newref", *files, ref, "--binsize", str(int(sim.binsize))])

# test sample with a trisomy-21-like gain
n21 = len(sim.bias[20])
t = sim.sample(gender="F", cnvs=[(21, 0, n21, 3.0)])
tp = os.path.join(tmp, "test.npz")
save_sample_npz(tp, sim.binsize, t, {"filter_rmdup": 0})
outid = os.path.join(tmp, "out")
main(["predict", tp, ref, outid, "--bed", "--plot"])

for suffix in ("_bins.bed", "_segments.bed", "_aberrations.bed",
               "_statistics.txt", ".plots/genome_wide.png"):
    path = outid + suffix
    assert os.path.exists(path), f"missing output {path}"
    print(f"ok: {path} ({os.path.getsize(path)} bytes)")

ab = open(outid + "_aberrations.bed").read()
print("aberrations:\n" + ab)
assert "21\t" in ab, "planted chr21 gain not called"

outdir = os.path.join(tmp, "batch")
main(["predict-batch", ref, outdir, "--infiles", tp, tp, "--bed"])
for base in ("test",):
    assert os.path.exists(os.path.join(outdir, base + "_segments.bed"))
print("predict-batch ok")
print("CLI drive PASSED")
