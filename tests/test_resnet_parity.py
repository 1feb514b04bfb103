"""ModifiedResNet tower parity vs the live reference torch module
(chexzero_clip.py:34-174,419-446). A randomly initialized reference CLIP-RN
is exported as a state dict, converted through the loader, and
encode_image must agree to fp32 tolerance — same pattern as
tests/test_clip_parity.py for the ViT tower."""

import importlib
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from lemon_tpu.models.clip import ClipConfig, ClipModel
from lemon_tpu.models.loader import detect_and_convert, rn_config_from_state_dict

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference/lib/models/chexzero_clip.py"


@pytest.fixture(scope="module")
def ref_clip_module():
    if not os.path.exists(REFERENCE):
        pytest.skip("reference tree not mounted")
    # chexzero_clip imports the BPE tokenizer, which needs ftfy/regex; the
    # model classes don't, so stub the missing deps — but only for the
    # duration of the import: a bare fake ftfy left in sys.modules breaks
    # transformers' CLIPTokenizer (it does `ftfy.fix_text`) in later tests.
    import re

    added = []
    for name, mod in (("ftfy", types.ModuleType("ftfy")), ("regex", re)):
        if name not in sys.modules:
            sys.modules[name] = mod
            added.append(name)
    sys.path.insert(0, "/root/reference")
    try:
        return importlib.import_module("lib.models.chexzero_clip")
    finally:
        sys.path.remove("/root/reference")
        for name in added:
            del sys.modules[name]


@pytest.fixture(scope="module")
def tiny_rn_pair(ref_clip_module):
    """(reference torch CLIP-RN in eval mode, its state dict) at toy scale."""
    torch.manual_seed(0)
    model = ref_clip_module.CLIP(
        embed_dim=32,
        image_resolution=64,
        vision_layers=(1, 1, 1, 1),
        vision_width=8,
        vision_patch_size=None,
        context_length=16,
        vocab_size=100,
        transformer_width=64,
        # heads must follow the width//64 convention that shape inference
        # assumes (both ours and the reference's build_model)
        transformer_heads=1,
        transformer_layers=2,
    )
    # Randomize BatchNorm running stats (fresh inits have mean=0/var=1,
    # which would hide conversion mistakes in the stats mapping).
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)
    model.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return model, sd


def test_rn_config_inference(tiny_rn_pair):
    _, sd = tiny_rn_pair
    cfg = rn_config_from_state_dict(sd)
    assert cfg.is_resnet
    assert cfg.vision_layers == (1, 1, 1, 1)
    assert cfg.vision_width == 8
    assert cfg.image_resolution == 64
    assert cfg.embed_dim == 32
    assert cfg.v_heads == 8 * 32 // 64


def test_rn_encode_image_parity(tiny_rn_pair):
    ref_model, sd = tiny_rn_pair
    params, cfg = detect_and_convert(sd)
    model = ClipModel(cfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model.encode_image(torch.from_numpy(pixels).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(model.apply(params, jnp.asarray(pixels), method="encode_image"))
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-5)


def test_rn_text_tower_and_full_forward(tiny_rn_pair):
    """Text side + logit computation also load for RN checkpoints."""
    ref_model, sd = tiny_rn_pair
    params, cfg = detect_and_convert(sd)
    model = ClipModel(cfg)

    rng = np.random.default_rng(1)
    tokens = rng.integers(1, 98, (3, 16)).astype(np.int64)
    tokens[:, -1] = 99  # highest id = EOT analog for argmax pooling
    with torch.no_grad():
        ref_txt = ref_model.encode_text(torch.from_numpy(tokens)).numpy()
    txt = np.asarray(model.apply(params, jnp.asarray(tokens, jnp.int32), method="encode_text"))
    np.testing.assert_allclose(txt, ref_txt, rtol=2e-4, atol=2e-5)
