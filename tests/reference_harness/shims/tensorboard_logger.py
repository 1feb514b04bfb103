"""tensorboard_logger shim: the reference instantiates Logger in four
baselines but never writes to it (SURVEY.md §5)."""


class Logger:
    def __init__(self, *a, **k):
        pass

    def log_value(self, *a, **k):
        pass
