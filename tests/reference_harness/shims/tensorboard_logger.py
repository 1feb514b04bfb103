"""tensorboard_logger shim: the reference instantiates Logger in four
baselines but never writes to it (SURVEY.md §5). The real package creates
``logdir`` on construction — train_zero_shot_clip_baseline.py relies on
that side effect before writing args.json into the same directory."""

import os


class Logger:
    def __init__(self, logdir=None, *a, **k):
        if logdir:
            os.makedirs(logdir, exist_ok=True)

    def log_value(self, *a, **k):
        pass
