"""LM coverage-model fit on synthetic mixture histograms."""

import numpy as np

from gossamer_tpu.algo.coverage import (
    estimate_coverage,
    estimate_trim_cutoff,
    fit_coverage_model,
)


def synth_hist(cov=30.0, err_lam=0.8, n_real=1_000_000, n_err=400_000, seed=0):
    rng = np.random.default_rng(seed)
    real = rng.normal(cov, np.sqrt(cov), n_real).round().astype(np.int64)
    err = rng.poisson(err_lam, n_err).astype(np.int64)
    counts = np.concatenate([real[real > 0], err[err > 0]])
    mult, freq = np.unique(counts, return_counts=True)
    return mult, freq


def test_fit_recovers_coverage():
    mult, freq = synth_hist(cov=30.0)
    m = fit_coverage_model(mult, freq)
    assert m is not None
    assert abs(m.mean - 30.0) < 3.0
    tp = m.trim_point()
    assert 1 <= tp < 15


def test_estimators_use_fit():
    mult, freq = synth_hist(cov=42.0, seed=3)
    cov = estimate_coverage(mult, freq)
    assert abs(cov - 42) <= 4
    cut = estimate_trim_cutoff(mult, freq)
    assert 1 <= cut < 25


def test_fallback_small_hist():
    mult = np.array([1, 2, 3, 30, 31], dtype=np.int64)
    freq = np.array([100, 40, 10, 50, 45], dtype=np.int64)
    assert estimate_coverage(mult, freq) >= 1
    assert estimate_trim_cutoff(mult, freq) >= 2
