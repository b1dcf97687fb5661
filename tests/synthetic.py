"""Synthetic shallow-WGS cohorts for tests and benchmarks.

Generates per-chromosome binned read counts with the statistical structure
the pipeline expects: shared per-bin mappability/GC bias across samples,
Poisson sampling noise, unmappable (zero) bins, sex-dependent gonosome copy
number, and optionally planted CNVs in a test sample.
"""

from __future__ import annotations

import numpy as np

# hg38-ish chromosome lengths in megabases (chr1..22, X, Y).
CHR_MBP = np.array(
    [
        248, 242, 198, 190, 181, 171, 159, 145, 138, 133,
        135, 133, 114, 107, 102, 90, 83, 80, 59, 64,
        47, 51, 156, 57,
    ],
    dtype=float,
)


def bins_per_chr(binsize: float, scale: float = 1.0) -> np.ndarray:
    """Bin counts per chromosome at ``binsize`` bp, optionally shrunk by
    ``scale`` (<1) to keep tests fast."""
    return np.maximum(
        (CHR_MBP * 1e6 * scale / binsize).astype(np.int64), 8
    )


class CohortSim:
    """Simulator holding the shared per-bin biases of a cohort."""

    def __init__(
        self,
        binsize: float = 1e5,
        genome_scale: float = 0.05,
        mean_reads_per_bin: float = 100.0,
        unmappable_frac: float = 0.05,
        seed: int = 0,
    ):
        self.binsize = binsize
        self.bins = bins_per_chr(binsize, genome_scale)
        self.rng = np.random.default_rng(seed)
        self.mean_reads = mean_reads_per_bin
        # Shared multiplicative bias per bin (mappability/GC proxy).
        self.bias = [
            np.exp(self.rng.normal(0.0, 0.15, size=n)) for n in self.bins
        ]
        # Unmappable bins get (near-)zero coverage in every sample.
        for b in self.bias:
            dead = self.rng.random(len(b)) < unmappable_frac
            b[dead] = 0.0

    def sample(self, gender: str = "F", cnvs: list | None = None) -> dict:
        """Draw one sample.

        ``cnvs`` is a list of (chr_1based, start_bin, end_bin, copies) with
        the diploid baseline at copies=2 (autosomes).
        """
        counts = {}
        # Per-sample depth and chrY mis-mapping variability widen the
        # y-fraction clusters realistically (a perfectly tight cluster makes
        # the GMM inter-mode density underflow).
        depth = float(np.exp(self.rng.normal(0.0, 0.25)))
        y_noise = float(self.rng.uniform(0.01, 0.06))
        for c in range(24):
            chrom = c + 1
            if chrom <= 22:
                copies = 2.0
            elif chrom == 23:
                copies = 2.0 if gender == "F" else 1.0
            else:
                copies = 2 * y_noise if gender == "F" else self.rng.uniform(0.8, 1.1)
            lam = depth * self.mean_reads * self.bias[c] * (copies / 2.0)
            if cnvs:
                lam = lam.copy()
                for chr1, s, e, cp in cnvs:
                    if chr1 == chrom:
                        lam[s:e] *= cp / copies
            counts[str(chrom)] = self.rng.poisson(lam).astype(np.int32)
        return counts

    def cohort(self, n_female: int, n_male: int, cnvs=None) -> tuple:
        """Draw a cohort; returns (samples list, genders list)."""
        samples, genders = [], []
        for _ in range(n_female):
            samples.append(self.sample("F", cnvs))
            genders.append("F")
        for _ in range(n_male):
            samples.append(self.sample("M", cnvs))
            genders.append("M")
        return samples, genders
