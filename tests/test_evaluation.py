"""CRPS/SSR/MSE metric tests (reference semantics: src/utilities/evaluation.py)."""
import numpy as np
import pytest

from dyffusion_tpu.utils.evaluation import (
    crps_ensemble,
    crps_ensemble_sorted,
    evaluate_ensemble_prediction,
    mse_ensemble,
    spread_skill_ratio,
)


def _naive_crps(preds, y):
    """Brute-force empirical-CDF CRPS for scalar y: integral of (F(t) - H(t-y))^2."""
    m = len(preds)
    skill = np.mean(np.abs(preds - y))
    spread = np.mean(np.abs(preds[:, None] - preds[None, :]))
    return skill - 0.5 * spread


def test_crps_matches_bruteforce():
    rng = np.random.default_rng(0)
    preds = rng.normal(size=(7, 5, 3, 4, 4)).astype(np.float32)
    targets = rng.normal(size=(5, 3, 4, 4)).astype(np.float32)
    expected = np.mean(
        [
            _naive_crps(preds[:, s, c, i, j], targets[s, c, i, j])
            for s in range(5)
            for c in range(3)
            for i in range(4)
            for j in range(4)
        ]
    )
    got = float(crps_ensemble(preds, targets))
    assert np.isclose(got, expected, rtol=1e-5)


def test_crps_sorted_matches_pairwise():
    rng = np.random.default_rng(1)
    preds = rng.normal(size=(20, 8, 6)).astype(np.float32)
    targets = rng.normal(size=(8, 6)).astype(np.float32)
    a = float(crps_ensemble(preds, targets))
    b = float(crps_ensemble_sorted(preds, targets))
    assert np.isclose(a, b, rtol=1e-4)


def test_crps_perfect_deterministic_ensemble_is_mae_zero():
    preds = np.ones((5, 4, 3)) * 2.0
    targets = np.ones((4, 3)) * 2.0
    assert float(crps_ensemble(preds, targets)) == pytest.approx(0.0, abs=1e-7)


def test_crps_against_xskillscore_if_available():
    xs = pytest.importorskip("xskillscore")
    xr = pytest.importorskip("xarray")
    if getattr(xs, "__is_stub__", False) or getattr(xr, "__is_stub__", False):
        # _reference_import installs sys.modules stubs for the torch-parity
        # tests; if those ran first in this process, the real lib is absent
        pytest.skip("xskillscore/xarray are parity-test stubs in this process")
    rng = np.random.default_rng(2)
    preds = rng.normal(size=(11, 6, 2, 5, 5))
    targets = rng.normal(size=(6, 2, 5, 5))
    dummy = [f"d{i}" for i in range(3)]
    ref = float(
        xs.crps_ensemble(
            observations=xr.DataArray(targets, dims=["sample"] + dummy),
            forecasts=xr.DataArray(preds, dims=["member", "sample"] + dummy),
            member_dim="member",
        ).values
    )
    got = float(crps_ensemble(preds, targets))
    assert np.isclose(got, ref, rtol=1e-5)


def test_mse_and_ssr_reference_semantics():
    rng = np.random.default_rng(3)
    preds = rng.normal(size=(9, 10, 4)).astype(np.float64)
    targets = rng.normal(size=(10, 4)).astype(np.float64)
    mse_ref = np.mean((preds.mean(0) - targets) ** 2)
    assert np.isclose(float(mse_ensemble(preds, targets)), mse_ref, rtol=1e-6)
    # SSR: sqrt(mean per-point variance) / rmse (ref evaluation.py:112-120)
    spread = np.sqrt(np.var(preds, axis=0).mean())
    ssr_ref = spread / np.sqrt(mse_ref)
    assert np.isclose(float(spread_skill_ratio(preds, targets)), ssr_ref, rtol=1e-5)


def test_evaluate_ensemble_prediction_dict():
    rng = np.random.default_rng(4)
    preds = rng.normal(size=(5, 7, 2, 3, 3)).astype(np.float32)
    targets = rng.normal(size=(7, 2, 3, 3)).astype(np.float32)
    out = evaluate_ensemble_prediction(preds, targets, also_per_member_metrics=True)
    assert set(out) >= {"mse", "crps", "ssr", "mse_per_mem"}
    assert out["mse_per_mem"].shape == (5,)
    out2 = evaluate_ensemble_prediction(preds, targets, mean_over_samples=False)
    assert out2["crps"].shape == (7,)
    assert np.isclose(out2["crps"].mean(), out["crps"], rtol=1e-5)


def test_nll_and_corr_match_reference_formulas():
    from dyffusion_tpu.utils.evaluation import corr_ensemble, nll_ensemble

    rng = np.random.default_rng(11)
    mu = rng.normal(size=(6, 3, 4))
    var = rng.uniform(0.5, 2.0, size=(6, 3, 4))
    y = rng.normal(size=(6, 3, 4))
    ref_nll = (0.5 * np.log(2 * np.pi * var) + (y - mu) ** 2 / (2 * var)).mean()
    assert np.isclose(float(nll_ensemble(mu, var, y)), ref_nll, rtol=1e-6)
    per_sample = np.asarray(nll_ensemble(mu, var, y, mean_over_samples=False))
    assert per_sample.shape == (6,)
    assert np.isclose(per_sample.mean(), ref_nll, rtol=1e-6)

    preds = rng.normal(size=(5, 6, 3, 4))
    mean_preds = preds.mean(0)
    ref_corr = np.corrcoef(mean_preds.reshape(1, -1), y.reshape(1, -1), rowvar=False)[0, 1]
    assert np.isclose(float(corr_ensemble(preds, y)), ref_corr, rtol=1e-5)


def test_metrics_match_literal_reference_numpy():
    """SSR / NLL / ensemble-mean MSE / Pearson corr vs the LITERAL reference
    functions (``src/utilities/evaluation.py:99-142`` — pure numpy; the
    xskillscore-backed CRPS is covered separately vs brute force)."""
    import pytest as _pytest

    _pytest.importorskip("torch")  # reference import machinery needs stubs
    from tests._reference_import import import_reference

    ref = import_reference("src.utilities.evaluation")
    from dyffusion_tpu.utils.evaluation import (
        corr_ensemble,
        mse_ensemble,
        nll_ensemble,
        spread_skill_ratio,
    )

    rng = np.random.default_rng(23)
    N, B, H, W = 5, 4, 6, 6
    preds = rng.normal(size=(N, B, H, W)).astype(np.float32)
    targets = rng.normal(size=(B, H, W)).astype(np.float32)

    np.testing.assert_allclose(
        float(mse_ensemble(preds, targets)),
        float(ref.evaluate_ensemble_mse(preds, targets)), rtol=1e-6)
    np.testing.assert_allclose(
        float(spread_skill_ratio(preds, targets)),
        float(ref.evaluate_ensemble_spread_skill_ratio(preds, targets)), rtol=1e-6)
    np.testing.assert_allclose(
        float(corr_ensemble(preds, targets)),
        float(ref.evaluate_ensemble_corr(preds, targets)), rtol=1e-5)

    mean_p = preds.mean(axis=0)
    var_p = preds.var(axis=0) + 0.1  # strictly positive variance
    np.testing.assert_allclose(
        float(nll_ensemble(mean_p, var_p, targets)),
        float(np.mean(ref.evaluate_ensemble_nll(mean_p, var_p, targets))), rtol=1e-6)
