"""open_clip shim (import-compatibility for lib/models/utils.py:9; the
biomed_clip branch is not exercised by the parity harness)."""


def create_model_from_pretrained(*a, **k):
    raise NotImplementedError("open_clip shim: biomed_clip not supported in the parity harness")


def get_tokenizer(*a, **k):
    raise NotImplementedError("open_clip shim: biomed_clip not supported in the parity harness")
