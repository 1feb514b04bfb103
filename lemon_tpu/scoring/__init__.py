from lemon_tpu.scoring.lemon import (
    HPARAM_ORDER,
    NeighborLogs,
    calc_scores,
    calc_scores_grid,
    pack_hparams,
    unpack_hparams,
)
from lemon_tpu.scoring.metrics import binary_metrics, eval_metrics, prob_metrics
from lemon_tpu.scoring.optimize import maximize_metric
from lemon_tpu.scoring.thresholds import (
    f1_with_local_minima_finder,
    f1_with_pred_prev_constraint,
    optimize_f1,
    optimize_f1_efficient,
)
