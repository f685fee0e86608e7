"""Dataset loaders: Pima (532), Breast-Cancer, Abalone (binarised).

Reference experiments use the UCI Pima 532-point subset, Wisconsin
Breast-Cancer, and a binarised Abalone set (BASELINE.json:8-9; Murray &
Graham 2016 §5), standardised per feature (SURVEY.md §2.1 "Datasets +
loaders").

Provenance in THIS environment (zero egress, SURVEY.md §0):

- ``breast_cancer``: REAL data — scikit-learn ships the Wisconsin
  diagnostic set (569 x 30) inside the package; loaded offline.
- ``pima`` / ``abalone``: the raw UCI files are not present and cannot be
  downloaded, so we generate deterministic synthetic stand-ins with the
  reference shapes (532 x 7, 4177 x 8 binarised at the median) from a
  latent-GP classification process at fixed seeds.  If a real CSV is placed
  at ``data/pima.csv`` / ``data/abalone.csv`` (rows: features..., label) it
  is used instead.  All downstream correctness claims compare against the
  in-repo NumPy oracle on the SAME data, so sampler validation is unaffected
  by the stand-in (BASELINE.md provenance note).

Labels are returned in {-1, +1}; features are standardised to zero mean and
unit variance.  ``load(name)`` returns ``(x, y)`` float32/float32 arrays.
"""

from __future__ import annotations

import os

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data")


def _standardize(x):
    x = np.asarray(x, np.float64)
    mu = x.mean(0)
    sd = x.std(0)
    sd[sd == 0] = 1.0
    return (x - mu) / sd


def _synthetic_gp_classification(n, d, seed, lengthscale=1.2, noise=0.3):
    """Deterministic latent-GP binary data: y = sign(f + eps), f ~ GP(0, SE)."""
    rng = np.random.default_rng(seed)
    # correlated features, like real tabular data
    a = rng.standard_normal((d, d)) / np.sqrt(d)
    x = rng.standard_normal((n, d)) @ (np.eye(d) + 0.5 * a)
    x = _standardize(x)
    sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    k = np.exp(-0.5 * sq / lengthscale**2) + 1e-6 * np.eye(n)
    f = np.linalg.cholesky(k) @ rng.standard_normal(n)
    y = np.sign(f + noise * rng.standard_normal(n))
    y[y == 0] = 1.0
    return x, y


def _maybe_csv(name):
    path = os.path.join(_DATA_DIR, f"{name}.csv")
    if os.path.exists(path):
        raw = np.loadtxt(path, delimiter=",")
        x = _standardize(raw[:, :-1])
        y = raw[:, -1]
        y = np.where(y > np.median(y), 1.0, -1.0) if set(np.unique(y)) - {-1.0, 1.0, 0.0} else np.where(y > 0, 1.0, -1.0)
        return x, y
    return None


def load_pima():
    """Pima Indians diabetes, 532-pt version (7 features).  Synthetic
    stand-in unless data/pima.csv exists (see module docstring)."""
    got = _maybe_csv("pima")
    if got is None:
        got = _synthetic_gp_classification(532, 7, seed=1532)
    return np.float32(got[0]), np.float32(got[1])


def load_breast_cancer():
    """Wisconsin diagnostic breast cancer (real data, via scikit-learn)."""
    from sklearn.datasets import load_breast_cancer as _load

    ds = _load()
    x = _standardize(ds.data)
    y = np.where(ds.target > 0, 1.0, -1.0)
    return np.float32(x), np.float32(y)


def load_abalone():
    """Abalone binarised at median rings (8 features).  Synthetic stand-in
    unless data/abalone.csv exists (see module docstring)."""
    got = _maybe_csv("abalone")
    if got is None:
        got = _synthetic_gp_classification(4177, 8, seed=4177)
    return np.float32(got[0]), np.float32(got[1])


DATASETS = {
    "pima": load_pima,
    "breast_cancer": load_breast_cancer,
    "abalone": load_abalone,
}


def load(name, subsample=None, seed=0):
    x, y = DATASETS[name]()
    if subsample is not None and subsample < x.shape[0]:
        idx = np.random.default_rng(seed).choice(x.shape[0], subsample, replace=False)
        x, y = x[idx], y[idx]
    return x, y
