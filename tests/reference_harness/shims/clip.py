"""OpenAI `clip` package shim (import-compatibility for
lib/models/utils.py:18; the chexzero branch is not exercised)."""


def load(*a, **k):
    raise NotImplementedError("clip shim: chexzero not supported in the parity harness")
