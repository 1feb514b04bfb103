"""Aggregation CLI regressions (cli/aggregate.py, agg_results.ipynb role)."""

import numpy as np
import pandas as pd

from lemon_tpu.cli.aggregate import paper_table


def _runs(dataset, rows):
    """rows: (knn_k, dist_type, seed, val_f1, test_auroc)"""
    return [
        {
            "dataset": dataset,
            "noise_type": "random",
            "noise_level": 0.4,
            "knn_k": k,
            "dist_type": d,
            "data_seed": s,
            "know_val_labels_val_F1_optimal": f1,
            "know_val_labels_test_AUROC": auroc,
            "know_val_labels_test_AUPRC": auroc - 0.1,
            "know_val_labels_test_F1_optimal": auroc - 0.2,
        }
        for k, d, s, f1, auroc in rows
    ]


def test_paper_table_winner_is_per_config_even_on_cross_config_ties():
    """Regression: the winner merge must join on config identity, not on
    the bare performance value — dataset B's best is (k=20, 0.95) even
    though its k=10 score (0.9) ties dataset A's best."""
    df = pd.DataFrame(
        _runs("A", [(10, "cos", 0, 0.7, 0.60), (20, "cos", 0, 0.9, 0.70)])
        + _runs("B", [(10, "cos", 0, 0.9, 0.80), (20, "cos", 0, 0.95, 0.99)])
    )
    table = paper_table(df)
    # index: (dataset, noise_type, noise_level); knn_k mean column
    k_of = {idx[0]: row[("knn_k", "mean")] for idx, row in table.iterrows()}
    assert k_of["A"] == 20
    assert k_of["B"] == 20  # was 10 before the fix (A's max matched B's k=10 row)
    auroc_of = {idx[0]: row[("AUROC", "mean")] for idx, row in table.iterrows()}
    assert np.isclose(auroc_of["B"], 0.99)


def test_paper_table_seed_aggregation():
    """Selection uses the MEAN val-F1 over seeds; the table reports
    mean±std of the winner's test metrics."""
    df = pd.DataFrame(
        _runs("A", [
            (10, "cos", 0, 0.8, 0.70), (10, "cos", 1, 0.8, 0.74),
            (20, "cos", 0, 0.9, 0.60), (20, "cos", 1, 0.5, 0.62),
        ])
    )
    table = paper_table(df)  # mean f1: k=10 -> 0.8, k=20 -> 0.7
    (_, row), = list(table.iterrows())
    assert row[("knn_k", "mean")] == 10
    assert np.isclose(row[("AUROC", "mean")], 0.72)
