"""Ensemble evaluation metrics: CRPS, spread-skill ratio, ensemble-mean MSE.

Capability parity with the reference's ``src/utilities/evaluation.py:10-156``
(``evaluate_ensemble_prediction`` returning {mse, crps, ssr}), but implemented
directly in JAX so metrics run on-device inside jitted eval loops instead of
round-tripping to CPU numpy/xarray/xskillscore.

CRPS uses the standard empirical-CDF estimator, identical to
``properscoring.crps_ensemble`` (which backs ``xskillscore.crps_ensemble``
used by the reference at ``evaluation.py:83-96``):

    CRPS(F_m, y) = (1/m) Σ_i |x_i − y| − (1/(2 m²)) Σ_i Σ_j |x_i − x_j|

Member axis is axis 0, matching the reference's ``ensemble_dim=0`` convention.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def crps_ensemble(predictions: Array, targets: Array, mean_over_samples: bool = True) -> Array:
    """CRPS of an m-member ensemble.

    Args:
        predictions: shape ``(m, n_samples, *dims)``.
        targets: shape ``(n_samples, *dims)``.
        mean_over_samples: if True return a scalar; else shape ``(n_samples,)``
            (mean over all trailing dims, as the reference does with
            ``mean_dims`` in ``evaluation.py:92``).
    """
    predictions = jnp.asarray(predictions)
    targets = jnp.asarray(targets)
    m = predictions.shape[0]
    # E|X - y|
    skill = jnp.mean(jnp.abs(predictions - targets[None]), axis=0)
    # E|X - X'| over all m^2 pairs (biased estimator == empirical-CDF integral)
    # O(m^2) memory in the member dim only; m <= 50 here so this is cheap.
    spread = jnp.mean(
        jnp.abs(predictions[:, None] - predictions[None, :]), axis=(0, 1)
    )
    crps = skill - 0.5 * spread
    if mean_over_samples:
        return jnp.mean(crps)
    return jnp.mean(crps.reshape(crps.shape[0], -1), axis=-1)


def crps_ensemble_sorted(predictions: Array, targets: Array, mean_over_samples: bool = True) -> Array:
    """O(m log m) CRPS via the sorted/weighted form; numerically identical to
    :func:`crps_ensemble` but WITHOUT the (m, m, *dims) pairwise intermediate
    — required for test-scale ensembles (50 members x full trajectories would
    otherwise materialize tens of GB)."""
    predictions = jnp.asarray(predictions)
    m = predictions.shape[0]
    x = jnp.sort(predictions, axis=0)
    y = jnp.asarray(targets)[None]
    # integral of (F(t) - 1{t >= y})^2 dt in closed form over sorted members
    skill = jnp.mean(jnp.abs(x - y), axis=0)
    i = jnp.arange(1, m + 1).reshape((m,) + (1,) * (predictions.ndim - 1))
    # sum_i x_(i) * (2i - m - 1) == 0.5 * sum_ij |x_i - x_j| / m (scaled)
    spread = jnp.sum(x * (2 * i - m - 1), axis=0) / (m * m)
    crps = skill - spread
    if mean_over_samples:
        return jnp.mean(crps)
    return jnp.mean(crps.reshape(crps.shape[0], -1), axis=-1)


def mse_ensemble(predictions: Array, targets: Array, mean_over_samples: bool = True) -> Array:
    """MSE of the ensemble-mean prediction (``evaluation.py:42-48``)."""
    mean_preds = jnp.mean(jnp.asarray(predictions), axis=0)
    err = (mean_preds - jnp.asarray(targets)) ** 2
    if mean_over_samples:
        return jnp.mean(err)
    return jnp.mean(err.reshape(err.shape[0], -1), axis=-1)


def spread_skill_ratio(
    predictions: Array,
    targets: Array,
    skill: Optional[Array] = None,
    mean_over_samples: bool = True,
) -> Array:
    """Ensemble stddev / RMSE (``evaluation.py:99-120``).

    Matches the reference order of operations: mean of the per-point ensemble
    variance first, sqrt second.
    """
    predictions = jnp.asarray(predictions)
    var = jnp.var(predictions, axis=0)
    if mean_over_samples:
        spread = jnp.sqrt(jnp.mean(var))
    else:
        spread = jnp.sqrt(jnp.mean(var.reshape(var.shape[0], -1), axis=-1))
    if skill is None:
        skill = jnp.sqrt(mse_ensemble(predictions, targets, mean_over_samples))
    return spread / skill


def nll_ensemble(
    mean_predictions: Array,
    var_predictions: Array,
    targets: Array,
    mean_over_samples: bool = True,
) -> Array:
    """Gaussian negative log-likelihood of (mean, variance) predictions
    (ref ``evaluation.py:123-130``: ``0.5 log(2 pi var) + (y - mu)^2 / (2 var)``)."""
    mean_predictions = jnp.asarray(mean_predictions)
    var_predictions = jnp.asarray(var_predictions)
    targets = jnp.asarray(targets)
    nll = 0.5 * jnp.log(2 * jnp.pi * var_predictions) + (targets - mean_predictions) ** 2 / (
        2 * var_predictions
    )
    if mean_over_samples:
        return jnp.mean(nll)
    return jnp.mean(nll.reshape(nll.shape[0], -1), axis=-1)


def corr_ensemble(predictions: Array, targets: Array) -> Array:
    """Pearson correlation of the ensemble-mean prediction with the targets
    (ref ``evaluate_ensemble_corr``, ``evaluation.py:139-142``)."""
    mean_preds = jnp.mean(jnp.asarray(predictions), axis=0).reshape(-1)
    t = jnp.asarray(targets).reshape(-1)
    mp = mean_preds - jnp.mean(mean_preds)
    tt = t - jnp.mean(t)
    return jnp.sum(mp * tt) / jnp.sqrt(jnp.sum(mp**2) * jnp.sum(tt**2))


def evaluate_ensemble_prediction(
    predictions,
    targets,
    mean_over_samples: bool = True,
    also_per_member_metrics: bool = False,
) -> Dict[str, np.ndarray]:
    """One-call {mse, crps, ssr} over an ensemble, mirroring
    ``evaluation.py:10-80``. Accepts numpy or JAX arrays; returns numpy.

    Args:
        predictions: ``(m, n_samples, *dims)``.
        targets: ``(n_samples, *dims)``.
    """
    predictions = jnp.asarray(predictions)
    targets = jnp.asarray(targets)
    assert predictions.shape[1:] == targets.shape, (
        f"predictions.shape[1:]={predictions.shape[1:]} != targets.shape={targets.shape}"
    )
    mse = mse_ensemble(predictions, targets, mean_over_samples)
    rmse = jnp.sqrt(mse)
    # sorted estimator: same value as the pairwise form, scales to 50-member
    # test ensembles over full trajectories
    crps = crps_ensemble_sorted(predictions, targets, mean_over_samples)
    ssr = spread_skill_ratio(predictions, targets, skill=rmse, mean_over_samples=mean_over_samples)
    out = {"mse": np.asarray(mse), "crps": np.asarray(crps), "ssr": np.asarray(ssr)}
    if also_per_member_metrics:
        diff = predictions - targets[None]
        per_mem = jnp.mean(diff**2, axis=tuple(range(1, predictions.ndim)))
        out["mse_per_mem"] = np.asarray(per_mem)
        out["mse_per_mem_mean"] = np.asarray(jnp.mean(per_mem))
    return out


def evaluate_ensemble_prediction_for_varying_members(
    predictions, targets
) -> Dict[str, np.ndarray]:
    """Metric sweep over ensemble sizes 1..m (ref ``evaluation.py:145-156``):
    for each n, metrics of the first-n-member sub-ensemble."""
    predictions = jnp.asarray(predictions)
    m = predictions.shape[0]
    out: Dict[str, list] = {}
    for n in range(1, m + 1):
        res = evaluate_ensemble_prediction(predictions[:n], targets)
        for k, v in res.items():
            out.setdefault(k, []).append(v)
    return {k: np.asarray(v) for k, v in out.items()}
