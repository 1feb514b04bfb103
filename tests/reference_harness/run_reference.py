"""Drive the LIVE reference run_lemon.py in this environment.

Run as a subprocess (it rewires sys.path/sys.modules):

    python tests/reference_harness/run_reference.py \
        --fixture_dir <caption fixture or cifar fixture parent> \
        --hf_checkpoint <dir from fixture.build_checkpoint()['hf_dir']> \
        -- --output_dir ... --dataset mscoco --noise_type random ...

What it does, and nothing more:

- prepends the shims/ dir (faiss/netcal/torchvision/... stand-ins for
  packages absent here) and /root/reference to sys.path
- seeds an empty ``lib.models.constants`` module (the reference's
  ``from . import constants`` at downstream_models.py:13 names a module
  that does not exist in the repo — a shipped defect, SURVEY.md §7)
- points PATHS['mscoco'] at the fixture and replaces
  ``algorithm_class_from_scratch`` with a local-checkpoint loader that
  still returns the reference's own HuggingfaceCLIPModel + a real
  CLIPTokenizer (the hard-coded hub name at lib/models/utils.py:66-67
  cannot resolve without network)
- chdirs next to the fixture so the reference's hard-coded ``./data``
  CIFAR root (lib/datasets/utils.py:358) resolves
- then executes /root/reference/run_lemon.py unmodified via runpy

Everything downstream — dataset assembly, noise injection, transforms,
embedding, faiss-role search, scoring, hparam optimization, outputs — is
the reference's own code.
"""

from __future__ import annotations

import argparse
import os
import runpy
import sys
import types
from pathlib import Path

HERE = Path(__file__).resolve().parent
REFERENCE = Path(os.environ.get("LEMON_REFERENCE_DIR", "/root/reference"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture_dir", required=True,
                    help="captioning fixture dir (multimodal_mislabel_split.pkl) "
                         "or a dir containing data/cifar-10-batches-py")
    ap.add_argument("--hf_checkpoint", required=True)
    ap.add_argument("--script", default="run_lemon.py",
                    help="reference script to execute, relative to the reference "
                         "root (e.g. lib/baselines/discrepancy_baseline.py)")
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="-- then the script's own args")
    args = ap.parse_args()
    run_lemon_args = args.rest[1:] if args.rest[:1] == ["--"] else args.rest

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    sys.path.insert(0, str(HERE / "shims"))
    sys.path.insert(0, str(REFERENCE))

    # the reference's missing lib/models/constants.py (vestigial import)
    import lib.models  # noqa: F401

    stub = types.ModuleType("lib.models.constants")
    sys.modules["lib.models.constants"] = stub
    lib.models.constants = stub

    import lib.datasets.utils as ref_datasets
    import lib.models.utils as ref_models

    fixture = Path(args.fixture_dir).resolve()
    ref_datasets.PATHS["mscoco"] = str(fixture)

    hf_dir = str(Path(args.hf_checkpoint).resolve())

    def local_algorithm_class_from_scratch(name, text_base_name, img_base, return_tokenizer=False):
        assert name == "huggingface_clip", f"parity harness only drives huggingface_clip, got {name}"
        from transformers import AutoTokenizer

        from lib.models.downstream_models import HuggingfaceCLIPModel

        tokenizer = AutoTokenizer.from_pretrained(hf_dir)
        model = HuggingfaceCLIPModel.from_pretrained(hf_dir)
        return (model, tokenizer) if return_tokenizer else model

    ref_models.algorithm_class_from_scratch = local_algorithm_class_from_scratch

    # Shipped defect in run_clip_sim.py: both --img_base_name CLI choices
    # ('clipvisionmodel'/'clipvisionmodelvit') are unhandled by get_img_base
    # (lib/models/utils.py:49-61 raises NotImplementedError), so the script
    # cannot start as released. The value is unused for huggingface_clip;
    # return None for exactly those dead names and leave the rest intact.
    _ref_get_img_base = ref_models.get_img_base

    def local_get_img_base(name, *a, **k):
        if name in ("clipvisionmodel", "clipvisionmodelvit"):
            return None
        return _ref_get_img_base(name, *a, **k)

    ref_models.get_img_base = local_get_img_base

    # ./data for the CIFAR branch (torchvision shim reads the pickles)
    if (fixture / "data").is_dir():
        os.chdir(fixture)
    else:
        os.chdir(fixture.parent)

    sys.argv = [Path(args.script).name, *run_lemon_args]
    runpy.run_path(str(REFERENCE / args.script), run_name="__main__")


if __name__ == "__main__":
    main()
