"""Sex (gender) model: Gaussian mixture over chrY read fractions.

Mirrors reference newref_tools.py:21-68 / predict_tools.py:17-24.  This is a
tiny host-side model (N samples, 1-D) — per SURVEY.md section 7 it stays off
the TPU.  We fit with sklearn's GaussianMixture using the reference's exact
hyper-parameters and find the cutoff as the first strict local minimum of
the mixture density on a 5000-point grid over [0, 0.02].
"""

from __future__ import annotations

import logging

import numpy as np
from sklearn.mixture import GaussianMixture

GRID = np.linspace(0, 0.02, 5000)


def y_fraction(sample: dict) -> float:
    """Fraction of reads on chrY (reference newref_tools.py:24-28)."""
    total = float(np.sum([np.sum(sample[k]) for k in sample.keys()]))
    return float(np.sum(sample["24"])) / total


def train_gender_model(
    samples: list[dict],
    yfrac_override: float | None = None,
    random_state: int | None = 0,
    max_iter: int = 10000,
    tol: float = 1e-12,
):
    """Fit the 2-component GMM and derive the M/F cutoff.

    Parameters mirror reference newref_tools.py:31-38 (full covariance,
    reg_covar=1e-99, max_iter=10000) with two deliberate deviations: the
    initializer is seeded by default for reproducible builds (pass
    ``random_state=None`` for reference-identical unseeded behavior) and the
    EM tolerance is 1e-12 instead of the reference's 1e-99 — the latter
    forces all 10000 iterations for no change in the fitted parameters
    beyond float64 noise (pass ``tol=1e-99`` to replicate exactly).

    Returns (genders list of "M"/"F"/None, cutoff float, fit dict for QC/plot).
    """
    y_fractions = np.array([y_fraction(s) for s in samples])

    gmm = GaussianMixture(
        n_components=2,
        covariance_type="full",
        reg_covar=1e-99,
        max_iter=max_iter,
        tol=tol,
        random_state=random_state,
    )
    gmm.fit(y_fractions.reshape(-1, 1))
    gmm_y = np.exp(gmm.score_samples(GRID.reshape(-1, 1)))

    if yfrac_override is not None:
        cutoff = float(yfrac_override)
    else:
        minima = _strict_local_minima(gmm_y)
        if len(minima) > 0:
            cutoff = float(GRID[minima[0]])
        else:
            # Documented fix over the reference: with extremely separated
            # clusters the mixture density underflows to exactly 0 between
            # the modes, leaving no *strict* local minimum — the reference
            # then crashes with IndexError (newref_tools.py:62).  Fall back
            # to the first interior point of the global-minimum plateau.
            interior = gmm_y[1:-1]
            i = int(np.argmin(interior)) + 1
            if i <= 1 or i >= len(gmm_y) - 2:
                raise RuntimeError(
                    "Could not determine a --yfrac cutoff: the Gaussian "
                    "mixture density is monotone on [0, 0.02]. Provide "
                    "--yfrac."
                )
            cutoff = float(GRID[i])
        logging.info("Determined --yfrac cutoff: %s", round(cutoff, 4))

    genders: list = [None] * len(samples)
    for i, yf in enumerate(y_fractions):
        if yf > cutoff:
            genders[i] = "M"
        elif yf < cutoff:
            genders[i] = "F"

    fit = {
        "y_fractions": y_fractions,
        "grid": GRID,
        "density": gmm_y,
        "means": gmm.means_.ravel(),
        "weights": gmm.weights_.ravel(),
    }
    return genders, cutoff, fit


def predict_gender(sample: dict, trained_cutoff: float) -> str:
    """'M' iff the chrY fraction exceeds the trained cutoff
    (reference predict_tools.py:17-24)."""
    return "M" if y_fraction(sample) > float(trained_cutoff) else "F"


def _strict_local_minima(y: np.ndarray) -> np.ndarray:
    """Indices i with y[i-1] > y[i] < y[i+1] (scipy argrelextrema(np.less))."""
    interior = (y[1:-1] < y[:-2]) & (y[1:-1] < y[2:])
    return np.nonzero(interior)[0] + 1
