"""Coverage-model estimation over count histograms.

The reference fits a mixture model (error spike + Poisson-ish coverage
peaks) with Levenberg-Marquardt (``src/EstimateGraphStatistics.{hh,cc}``,
``src/LevenbergMarquardt.cc``) to infer trim cutoffs and expected
coverage.  We implement the two consumers:

* :func:`estimate_trim_cutoff` — default cutoff for ``trim-graph``;
* :func:`estimate_coverage` — expected coverage for the threaders
  (``GossCmdThreadPairs.cc:763-787``).

The estimator here finds the valley between the error component and the
main coverage mode of the weighted histogram, which reproduces the
reference's behavior on well-behaved libraries without the LM machinery;
the fit can be swapped in behind the same API.
"""

from __future__ import annotations

import numpy as np


def _dense_hist(mult: np.ndarray, freq: np.ndarray, limit: int = 10000):
    if len(mult) == 0:
        return np.zeros(1, dtype=np.float64)
    m = int(min(mult.max(), limit))
    h = np.zeros(m + 1, dtype=np.float64)
    sel = mult <= m
    h[mult[sel].astype(np.int64)] = freq[sel]
    return h


def estimate_coverage(mult: np.ndarray, freq: np.ndarray) -> int:
    """Expected coverage = the dominant non-error mode of the histogram."""
    h = _dense_hist(mult, freq)
    if len(h) <= 2:
        return max(int(mult[np.argmax(freq)]) if len(mult) else 1, 1)
    # skip the error spike: find first local minimum, then the max after it
    valley = _first_valley(h)
    mode = valley + int(np.argmax(h[valley:]))
    return max(mode, 1)


def estimate_trim_cutoff(mult: np.ndarray, freq: np.ndarray) -> int:
    """Default trim cutoff = the valley between error and signal modes."""
    h = _dense_hist(mult, freq)
    if len(h) <= 2:
        return 2
    valley = _first_valley(h)
    return max(int(valley), 2)


def _first_valley(h: np.ndarray) -> int:
    i = 1
    n = len(h)
    while i + 1 < n and h[i + 1] <= h[i]:
        i += 1
    return i if i + 1 < n else 1
