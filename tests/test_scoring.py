"""Golden-value tests for the LEMoN score, thresholds, metrics, and the
hyperparameter optimizer (SURVEY.md §4 plan item 1; §7 build step 4)."""

import numpy as np
import pytest
from sklearn.metrics import f1_score, roc_auc_score

import jax.numpy as jnp

from lemon_tpu.scoring.lemon import (
    NeighborLogs,
    calc_scores,
    calc_scores_grid,
    pack_hparams,
    unpack_hparams,
)
from lemon_tpu.scoring.metrics import (
    auroc_device,
    binary_metrics,
    eval_metrics,
    expected_calibration_error,
    prob_metrics,
)
from lemon_tpu.scoring.optimize import (
    _best_f1_rows,
    default_grid,
    grid_best_f1_device,
    grid_to_matrix,
    maximize_metric,
)
from lemon_tpu.scoring.thresholds import (
    f1_with_local_minima_finder,
    f1_with_pred_prev_constraint,
    optimize_f1,
    optimize_f1_efficient,
    optimize_f1_exact,
)


def make_logs(n=200, k=5, seed=0, signal=True):
    rng = np.random.default_rng(seed)
    is_mis = rng.random(n) < 0.4
    bump = is_mis.astype(np.float64)

    def noisy(scale=1.0, shape=None):
        return rng.random(shape or (n, k)) * scale

    return NeighborLogs(
        d_1=0.5 * rng.random(n) + (0.3 * bump if signal else 0),
        dists_n=noisy() + (0.3 * bump[:, None] if signal else 0),
        D_n=noisy(),
        dists_tr_n=noisy(),
        dists_m=noisy() + (0.2 * bump[:, None] if signal else 0),
        D_m=noisy(),
        dists_tr_m=noisy(),
        is_mislabel=is_mis.astype(np.int64),
        sset=np.array(["val"] * n),
    )


def manual_score(logs, h):
    """Independent row-by-row transcription of the paper formula."""
    out = np.zeros(len(logs))
    for i in range(len(logs)):
        wn = np.exp(-h["tau_1_n"] * logs.D_n[i]) * np.exp(-h["tau_2_n"] * logs.dists_tr_n[i])
        wm = np.exp(-h["tau_1_m"] * logs.D_m[i]) * np.exp(-h["tau_2_m"] * logs.dists_tr_m[i])
        d_n = float(wn @ logs.dists_n[i]) / logs.k
        d_m = float(wm @ logs.dists_m[i]) / logs.k
        out[i] = logs.d_1[i] + h["beta"] * d_n + h["gamma"] * d_m
    return out


def test_pack_unpack_and_ablation_masks():
    h = unpack_hparams([1, 2, 3, 4, 5, 6])
    assert h == {"beta": 1, "gamma": 2, "tau_1_n": 3, "tau_2_n": 4, "tau_1_m": 5, "tau_2_m": 6}
    np.testing.assert_array_equal(pack_hparams(h), [1, 2, 3, 4, 5, 6])

    h = unpack_hparams([1, 2, 3, 4, 5, 6], force_zero=["beta"], force_one=["gamma"])
    assert h["beta"] == 0.0 and h["gamma"] == 1.0


def test_calc_scores_matches_manual():
    logs = make_logs()
    h = unpack_hparams([5, 7, 0.1, 5, 0.3, 2])
    np.testing.assert_allclose(calc_scores(logs, h), manual_score(logs, h), rtol=1e-12)

    s, dn, dm = calc_scores(logs, h, return_components=True)
    np.testing.assert_allclose(s, logs.d_1 + 5 * dn + 7 * dm, rtol=1e-12)


def test_device_grid_matches_numpy():
    logs = make_logs(n=64, k=3)
    grid = np.array([[0, 0, 0, 0, 0, 0], [5, 7, 0.1, 5, 0.3, 2], [100, 0, 10, 10, 10, 10]], np.float64)
    dev = calc_scores_grid(logs, grid)
    for g, row in enumerate(grid):
        np.testing.assert_allclose(dev[g], manual_score(logs, unpack_hparams(row)), rtol=2e-4, atol=2e-5)


def test_grid_to_matrix_shared_taus():
    gm = grid_to_matrix({"beta": [1], "gamma": [2], "tau_1": [3, 4], "tau_2": [5]})
    assert gm.shape == (2, 6)
    np.testing.assert_array_equal(gm[0], [1, 2, 3, 5, 3, 5])
    np.testing.assert_array_equal(gm[1], [1, 2, 4, 5, 4, 5])
    assert grid_to_matrix(default_grid()).shape == (21 * 21 * 4 * 4, 6)


def test_optimize_f1_exact_is_optimal():
    rng = np.random.default_rng(3)
    for trial in range(5):
        y = (rng.random(100) < 0.4).astype(int)
        score = rng.random(100) + 0.3 * y
        f1_exact, t = optimize_f1_exact(y, score, True)
        assert f1_exact == pytest.approx(f1_score(y, score >= t))
        # exact >= both reference scans
        assert f1_exact >= optimize_f1(y, score) - 1e-12
        assert f1_exact >= optimize_f1_efficient(y, score) - 1e-12
        # brute force over every observed threshold
        brute = max(f1_score(y, score >= s) for s in score)
        assert f1_exact == pytest.approx(brute)


def test_best_f1_rows_device_matches_exact():
    rng = np.random.default_rng(4)
    y = (rng.random(200) < 0.3).astype(int)
    scores = rng.random((7, 200)) + 0.2 * y[None]
    dev = np.asarray(_best_f1_rows(jnp.asarray(scores, jnp.float32), jnp.asarray(y, jnp.float32)))
    for g in range(7):
        assert dev[g] == pytest.approx(optimize_f1_exact(y, scores[g]), abs=1e-5)


def test_prevalence_threshold():
    rng = np.random.default_rng(5)
    y = (rng.random(500) < 0.4).astype(int)
    score = rng.random(500) + y
    f1, t = f1_with_pred_prev_constraint(y, score, 0.4, True)
    assert abs((score >= t).mean() - 0.4) < 0.01
    assert 0 < f1 <= 1


def test_local_minima_threshold_bimodal():
    rng = np.random.default_rng(6)
    score = np.concatenate([rng.normal(0, 0.3, 300), rng.normal(3, 0.3, 200)])
    y = (np.arange(500) >= 300).astype(int)
    f1, t = f1_with_local_minima_finder(y, score, True)
    assert 0.8 < t < 2.2  # threshold lands in the density valley
    assert f1 > 0.95


def test_binary_metrics_fields():
    y = np.array([0, 0, 1, 1, 1])
    p = np.array([0, 1, 1, 1, 0])
    m = binary_metrics(y, p, suffix="_x")
    assert m["TP_x"] == 2 and m["FP_x"] == 1 and m["FN_x"] == 1 and m["TN_x"] == 1
    assert m["TPR_x"] == pytest.approx(2 / 3)
    assert m["PPV_x"] == pytest.approx(2 / 3)
    assert m["prevalence_x"] == pytest.approx(3 / 5)
    assert m["F1_x"] == pytest.approx(f1_score(y, p))


def test_prob_metrics_and_eval_metrics():
    rng = np.random.default_rng(7)
    y = (rng.random(300) < 0.4).astype(int)
    score = rng.random(300) + 0.8 * y
    pm = prob_metrics(y, score)
    assert pm["AUROC"] == pytest.approx(roc_auc_score(y, score))
    em = eval_metrics(y, score, prevalence=0.4)
    for key in ("AUROC", "AUPRC", "F1_optimal_thres", "F1_prev_thres", "F1_heuristic_thres", "F1_optimal", "F1_prev", "F1_heuristic"):
        assert key in em
    # fixed thresholds are honored
    em2 = eval_metrics(y, score, prevalence=0.4, fix_thress={"F1_optimal_thres": em["F1_optimal_thres"]})
    assert em2["F1_optimal"] == em["F1_optimal"]


def test_auroc_device_matches_sklearn():
    rng = np.random.default_rng(8)
    y = (rng.random(400) < 0.35).astype(int)
    score = np.round(rng.random(400) + 0.5 * y, 2)  # ties included
    ours = float(auroc_device(jnp.asarray(y), jnp.asarray(score, jnp.float32)))
    assert ours == pytest.approx(roc_auc_score(y, score), abs=1e-5)


def test_ece_calibrated_vs_not():
    rng = np.random.default_rng(9)
    conf = rng.random(5000)
    correct = (rng.random(5000) < conf).astype(float)  # well calibrated
    assert expected_calibration_error(conf, correct) < 0.03
    assert expected_calibration_error(conf, 1 - correct) > 0.3


def test_maximize_metric_improves_and_respects_masks():
    logs = make_logs(n=150, k=4, seed=11)
    y = logs.is_mislabel

    base_f1 = optimize_f1_efficient(y, calc_scores(logs, unpack_hparams([0] * 6)))
    small_grid = {"beta": [0, 5, 20], "gamma": [0, 5, 20], "tau_1": [0, 5], "tau_2": [0, 5]}
    best_x, best_val, thres = maximize_metric(logs, grid=small_grid, x0s=[[0] * 6, [1] * 6])
    assert best_val >= base_f1 - 1e-9
    assert np.isfinite(thres)

    best_x, _, _ = maximize_metric(
        logs, grid=small_grid, x0s=[[1] * 6], force_zero=["beta"], force_one=["gamma"]
    )
    assert best_x[0] == 0.0 and best_x[1] == 1.0

    # empty x0s skips the proxy stage on the device path too (regression:
    # np.asarray([]) used to feed vmap a (0,)-shaped x0 matrix and crash)
    _, val_empty, _ = maximize_metric(logs, grid=small_grid, x0s=[], use_device_grid=True)
    assert val_empty >= base_f1 - 1e-9


def test_strict_grid_path_matches_reference_transcription():
    """use_device_grid=False must evaluate EVERY grid point under the
    caller's objective, exactly like lib/metrics/utils.py:173-190 (round-1
    verdict weak #4). With no optimizer starts the winner is pinned to a
    direct transcription loop."""
    logs = make_logs(n=120, k=3, seed=7)
    y = logs.is_mislabel
    small_grid = {"beta": [0, 5, 20], "gamma": [0, 5, 20], "tau_1": [0, 5], "tau_2": [0, 5]}

    best_x, best_val, thres = maximize_metric(
        logs, grid=small_grid, x0s=[], use_device_grid=False
    )

    # reference grid section: scan all points under obj_func, keep the best
    oracle_x, oracle_val = None, -1.0
    for row in grid_to_matrix(small_grid):
        val = optimize_f1_efficient(y, calc_scores(logs, unpack_hparams(row)))
        if val > oracle_val:
            oracle_val, oracle_x = val, row
    np.testing.assert_array_equal(best_x, oracle_x)
    assert best_val == pytest.approx(oracle_val, abs=0)
    _, oracle_thres = optimize_f1_efficient(y, calc_scores(logs, unpack_hparams(oracle_x)), return_thres=True)
    assert thres == pytest.approx(oracle_thres)


def test_detection_config_strict_parity_flag():
    """DetectionConfig.strict_hparam_parity routes select_and_evaluate
    through the full-scan grid path."""
    from unittest import mock

    from lemon_tpu.detect import DetectionConfig, select_and_evaluate

    logs = make_logs(n=90, k=3, seed=5)
    cfg = DetectionConfig(strict_hparam_parity=True,
                          grid={"beta": [0, 5], "gamma": [0, 5], "tau_1": [0], "tau_2": [0]})
    with mock.patch("lemon_tpu.detect.maximize_metric", wraps=maximize_metric) as mm:
        select_and_evaluate(cfg, logs)
        assert mm.call_args.kwargs["use_device_grid"] is False


def test_fast_f1_bit_identical_to_sklearn():
    """_fast_f1 must equal sklearn.metrics.f1_score to the last bit (the
    fminbound trajectory in optimize_f1_efficient depends on exact values)."""
    from sklearn.metrics import f1_score

    from lemon_tpu.scoring.thresholds import _fast_f1

    rng = np.random.default_rng(0)
    for n in (1, 7, 200, 999):
        for _ in range(20):
            y = rng.integers(0, 2, n).astype(bool)
            pred = rng.integers(0, 2, n).astype(bool)
            a = _fast_f1(y, pred)
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                b = float(f1_score(y, pred))
            assert a == b, (n, a, b)
    # degenerate: no positives anywhere
    assert _fast_f1(np.zeros(5, bool), np.zeros(5, bool)) == 0.0


def test_threshold_search_rejects_non_binary_labels():
    from lemon_tpu.scoring.thresholds import optimize_f1_efficient

    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        optimize_f1_efficient(np.array([0, 1, 2]), rng.random(3))
    with pytest.raises(ValueError):
        optimize_f1_efficient(rng.random(5), rng.random(5))  # continuous
    # int {0,1} and bool both fine
    optimize_f1_efficient(np.array([0, 1, 1]), rng.random(3))
    optimize_f1_efficient(np.array([True, False, True]), rng.random(3))


def test_device_proxy_lbfgs_candidates_comparable_to_scipy():
    """The vmapped on-device optax L-BFGS proxy yields ensemble candidates
    of the same quality class as the host scipy path (trajectories differ;
    the ensemble takes best-by-objective, so only quality matters)."""
    import jax.numpy as jnp

    from lemon_tpu.scoring.optimize import (
        _objective,
        _proxy_arrays,
        _proxy_lbfgs,
        _proxy_lbfgs_device_batch,
    )
    from lemon_tpu.scoring.thresholds import optimize_f1_efficient

    logs = make_logs(300, 5, seed=0)
    y = np.asarray(logs.is_mislabel)
    x0s = ((0,) * 6, (0.5,) * 6, (1,) * 6, (10,) * 6)
    arrays, ys, fz, fo = _proxy_arrays(logs, y, (), ())
    x0m = jnp.asarray(np.asarray(x0s, np.float64), arrays[0].dtype)
    dev = np.asarray(_proxy_lbfgs_device_batch(x0m, arrays, ys, fz, fo), np.float64)
    assert np.isfinite(dev).all() and dev.shape == (4, 6)
    best_dev = max(-_objective(c, logs, y, optimize_f1_efficient, {}, (), ()) for c in dev)
    best_scipy = max(
        -_objective(np.asarray(_proxy_lbfgs(logs, y, x0, (), ())), logs, y, optimize_f1_efficient, {}, (), ())
        for x0 in x0s
    )
    assert best_dev >= best_scipy - 0.02


def test_device_proxy_lbfgs_terminates_on_cosine_like_data_and_extreme_restarts():
    """Regression: on real cosine-path components (D ~ -1, dists_tr ~ 1) the
    far-from-optimum (10,)*6 ensemble restart drove exp(-tau*D) past float32
    overflow, and the inf/NaN-poisoned zoom linesearch inside the scanned
    device L-BFGS executed for tens of minutes on XLA:CPU (it hung real
    sweep jobs). The loss now clamps hparams to the grid's |h| <= 100 domain
    and the linesearch is bounded backtracking — every restart, including an
    immediately-overflowing x0=200, must terminate promptly with in-domain
    finite candidates."""
    import time

    import jax.numpy as jnp

    from lemon_tpu.scoring.optimize import _proxy_arrays, _proxy_lbfgs_device_batch

    rng = np.random.default_rng(3)
    n, k = 15, 5
    is_mis = rng.random(n) < 0.4
    logs = NeighborLogs(
        d_1=1.0 + 0.2 * rng.random(n),
        dists_n=0.1 * rng.random((n, k)),
        D_n=-1.0 + 0.01 * rng.random((n, k)),
        dists_tr_n=0.8 + 0.35 * rng.random((n, k)),
        dists_m=0.4 * rng.random((n, k)),
        D_m=-1.0 + 0.04 * rng.random((n, k)),
        dists_tr_m=0.8 + 0.35 * rng.random((n, k)),
        is_mislabel=is_mis.astype(np.int64),
        sset=np.array(["val"] * n),
    )
    arrays, ys, fz, fo = _proxy_arrays(logs, np.asarray(logs.is_mislabel), (), ())
    x0 = jnp.asarray(
        np.array([[0.0] * 6, [1.0] * 6, [10.0] * 6, [200.0] * 6]), arrays[0].dtype
    )
    t0 = time.time()
    out = np.asarray(_proxy_lbfgs_device_batch(x0, arrays, ys, fz, fo))
    wall = time.time() - t0
    assert np.isfinite(out).all()
    assert (np.abs(out) <= 100.0).all()  # candidates live in the clamped domain
    # pre-fix this ran 25+ minutes; generous bound still catches the hang
    assert wall < 300, f"device proxy took {wall:.0f}s — linesearch pathology is back"
