"""ftfy shim: only imported by lib/models/simple_tokenizer.py, whose BPE
path is unused by the huggingface_clip parity runs (AutoTokenizer is the
live tokenizer). Identity text fixing is sufficient for import."""


def fix_text(text):
    return text
