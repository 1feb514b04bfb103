"""netcal.metrics.ECE shim: equal-width binned expected calibration error
(the only symbol the reference imports, lib/metrics/utils.py:16; used in
get_stats which the parity runs do not reach — implemented anyway)."""

import numpy as np


class ECE:
    def __init__(self, bins=10):
        self.bins = int(bins)

    def measure(self, confidences, y):
        conf = np.asarray(confidences, dtype=np.float64)
        y = np.asarray(y)
        if conf.ndim == 2:  # multiclass: confidence of argmax, correctness vs y
            pred = conf.argmax(axis=1)
            correct = (pred == y).astype(np.float64)
            conf = conf.max(axis=1)
        else:
            correct = y.astype(np.float64)
        edges = np.linspace(0.0, 1.0, self.bins + 1)
        which = np.clip(np.digitize(conf, edges[1:-1]), 0, self.bins - 1)
        ece = 0.0
        for b in range(self.bins):
            m = which == b
            if m.any():
                ece += m.mean() * abs(correct[m].mean() - conf[m].mean())
        return float(ece)
