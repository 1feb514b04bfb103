"""Tokenizer golden-value and HF-parity tests (SURVEY.md §4 plan item 1)."""

import gzip
import json
import os
import random
import string
import tempfile

import numpy as np
import pytest

from lemon_tpu.models.tokenizer import (
    CONTEXT_LENGTH,
    attention_mask_for,
    default_vocab_path,
    get_tokenizer,
    tokenize_batch,
)


def test_golden_ids():
    tok = get_tokenizer()
    # Well-known CLIP token ids for the canonical prompt.
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]
    assert tok.encode("a photo of a dog") == [320, 1125, 539, 320, 1929]
    assert tok.sot_id == 49406 and tok.eot_id == 49407


def test_case_and_whitespace_insensitivity():
    tok = get_tokenizer()
    assert tok.encode("A  Photo of a CAT ") == tok.encode("a photo of a cat")


def test_roundtrip_decode():
    tok = get_tokenizer()
    text = "hello , world ! it 's a test . "
    assert tok.decode(tok.encode(text)) == text


def test_tokenize_batch_shapes_and_truncation():
    arr = tokenize_batch(["a photo of a cat"], context_length=8)
    assert arr.shape == (1, 8)
    assert arr[0, 0] == 49406 and arr[0, 6] == 49407 and arr[0, 7] == 0

    long = " ".join(["cat"] * 200)
    arr = tokenize_batch([long], context_length=CONTEXT_LENGTH)
    assert arr.shape == (1, 77)
    assert arr[0, -1] == 49407  # truncation forces EOT at the end

    eot_padded = tokenize_batch(["hi"], context_length=8, pad_mode="eot")
    assert (eot_padded[0, 4:] == 49407).all()
    # argmax-EOT pooling picks the same position in both pad modes
    zeros = tokenize_batch(["hi"], context_length=8)
    assert np.argmax(zeros[0]) == np.argmax(eot_padded[0])


def test_attention_mask():
    arr = tokenize_batch(["a photo"], context_length=8)
    mask = attention_mask_for(arr)
    assert mask.tolist() == [[1, 1, 1, 1, 0, 0, 0, 0]]


def test_hf_clip_tokenizer_parity():
    """Bit-exact token ids vs transformers.CLIPTokenizer over random text."""
    transformers = pytest.importorskip("transformers")
    tok = get_tokenizer()

    lines = gzip.open(default_vocab_path()).read().decode("utf-8").split("\n")
    merges = lines[1 : 49408 - 512 - 2 + 1]
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump({t: i for i, t in enumerate(tok.id_to_token)}, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version\n" + "\n".join(merges))
    hf = transformers.CLIPTokenizer(os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt"))

    rnd = random.Random(0)
    alphabet = string.ascii_letters + string.digits + " .,!?-'\";:()"
    samples = [
        "a photo of a cat",
        "A bright-red automobile; parked (near) the #1 café!",
        "naïve café résumé 123",
        "x-ray shows NO acute cardiopulmonary process.",
    ] + ["".join(rnd.choices(alphabet, k=40)) for _ in range(50)]
    for s in samples:
        assert tok.encode(s) == hf(s)["input_ids"][1:-1], repr(s)
