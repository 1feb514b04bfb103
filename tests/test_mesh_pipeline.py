"""Full detection pipeline over the 8-virtual-device mesh: the sharded
embed + sharded kNN path must produce the same scores as single-device."""

import numpy as np
import pytest

from lemon_tpu.detect import DetectionConfig, run_detection

SMALL_GRID = {"beta": [0, 5], "gamma": [0, 5], "tau_1": [0], "tau_2": [0]}


def base_cfg(**kw):
    return DetectionConfig(
        dataset="synthetic_caption", noise_type="random", noise_level=0.4,
        clip_model="tiny", knn_k=3, batch_size=64, synthetic_n=160, knn_tile=32,
        grid=SMALL_GRID, skip_train=True, **kw,
    )


def test_mesh_pipeline_matches_single_device():
    res_single = run_detection(base_cfg())
    res_mesh = run_detection(base_cfg(mesh_shape=(8, 1)))

    s1 = res_single["df"]["know_val_labels_pred_score"].to_numpy()
    s2 = res_mesh["df"]["know_val_labels_pred_score"].to_numpy()
    # same embeddings (batch padding is identical), same kNN semantics ->
    # scores agree to float tolerance
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)
    a1 = res_single["agg_results"]["know_val_labels"]["test"]["AUROC"]
    a2 = res_mesh["agg_results"]["know_val_labels"]["test"]["AUROC"]
    assert a1 == pytest.approx(a2, abs=1e-6)
