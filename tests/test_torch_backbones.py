"""Alternate classifier backbones (round-2 verdict missing item #2).

The reference's get_img_base offers torchvision resnet50-with-768-fc and
google ViT besides CLIP (lib/models/utils.py:49-61); these tests pin

- TvResNet50 (Flax) against a torch ResNet-50 in torchvision's exact
  layout (the harness shim) through the state-dict converter: eval-mode
  forward parity, train-mode (batch-stat) forward parity, and the BN
  running-stat update,
- GoogleViTEncoder against a tiny transformers ViTModel (CLS output),
- the AUM baseline end-to-end on a resnet50 backbone with the per-epoch
  pkl contract (the reference's only runnable training_dependent config).
"""

from __future__ import annotations

import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SHIMS = Path(__file__).parent / "reference_harness" / "shims"


def _torch_resnet(width=8, layers=(1, 1, 1, 1), embed_dim=32, seed=0):
    sys.path.insert(0, str(SHIMS))
    try:
        from torchvision.models import resnet50
    finally:
        sys.path.pop(0)
    torch.manual_seed(seed)
    m = resnet50(width=width, layers=layers, num_classes=embed_dim)
    # non-trivial BN running stats so eval mode actually uses them
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.add_(torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.mul_(torch.rand_like(mod.running_var) * 0.5 + 0.75)
    return m


def test_tv_resnet50_conversion_parity():
    import jax.numpy as jnp

    from lemon_tpu.models.torch_backbones import TvResNet50, convert_tv_resnet50

    tm = _torch_resnet().eval()
    variables = convert_tv_resnet50(
        {k: v.numpy() for k, v in tm.state_dict().items()},
        embed_dim=32, stage_sizes=(1, 1, 1, 1))
    model = TvResNet50(embed_dim=32, stage_sizes=(1, 1, 1, 1), width=8)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)


def test_tv_resnet50_train_mode_and_running_stats():
    import jax.numpy as jnp

    from lemon_tpu.models.torch_backbones import TvResNet50, convert_tv_resnet50

    tm = _torch_resnet(seed=1)
    variables = convert_tv_resnet50(
        {k: v.numpy() for k, v in tm.state_dict().items()},
        embed_dim=32, stage_sizes=(1, 1, 1, 1))
    model = TvResNet50(embed_dim=32, stage_sizes=(1, 1, 1, 1), width=8)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 64, 64, 3)).astype(np.float32)
    ours, upd = model.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    tm.train()
    theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(), atol=3e-4, rtol=3e-4)
    # running stats after one train step: torch uses momentum 0.1 and
    # UNBIASED batch variance for the running update; flax momentum 0.9
    # retention matches the mean but uses biased variance — compare the
    # mean exactly and the var within the n/(n-1) correction of the batch
    # component
    sd = tm.state_dict()
    got_mean = np.asarray(upd["batch_stats"]["bn1"]["mean"])
    np.testing.assert_allclose(got_mean, sd["bn1.running_mean"].numpy(), atol=1e-5, rtol=1e-4)
    got_var = np.asarray(upd["batch_stats"]["bn1"]["var"])
    ref_var = sd["bn1.running_var"].numpy()
    assert np.all(np.abs(got_var - ref_var) <= 0.1 * np.abs(ref_var) + 1e-3)


def test_google_vit_conversion_parity():
    import jax.numpy as jnp
    from transformers import ViTConfig, ViTModel

    from lemon_tpu.models.torch_backbones import GoogleViTConfig, GoogleViTEncoder, convert_hf_vit

    torch.manual_seed(0)
    hf = ViTModel(ViTConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=48, image_size=32, patch_size=8),
                  add_pooling_layer=False).eval()
    cfg = GoogleViTConfig.tiny()
    variables = convert_hf_vit({k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    model = GoogleViTEncoder(cfg)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state[:, 0, :].numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("img_base_name", ["resnet50_tiny", "vit_tiny"])
def test_aum_e2e_on_alternate_backbone(tmp_path, img_base_name):
    """The reference's runnable training_dependent configuration
    (--img_base_name resnet50) on matched architecture: per-epoch pkl
    contract + finite, discriminative scores."""
    from lemon_tpu.cli.run_baseline import main as run_baseline_main

    out = tmp_path / img_base_name
    run_baseline_main([
        "--baseline", "aum", "--img_base_name", img_base_name,
        "--dataset", "synthetic", "--noise_type", "symmetric", "--noise_level", "0.4",
        "--synthetic_n", "120", "--epochs", "2", "--batch_size", "32",
        "--output_dir", str(out), "--debug",
    ])
    assert (out / "done").exists()
    with open(out / "val_epoch_0.pkl", "rb") as f:
        frame = pickle.load(f)
    assert frame["prediction"].ndim == 2 and np.isfinite(frame["prediction"]).all()
    import pandas as pd

    df = pd.read_csv(out / "scores.csv")
    assert np.isfinite(df["pred_score"].values).all()
