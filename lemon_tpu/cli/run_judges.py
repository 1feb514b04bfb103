"""Generative-judge baseline CLI (LLaVA yes/no, VDC pipeline).

Counterpart of lib/baselines/run_llava.py and run_vdc.py. The prompts and
parsers live in lemon_tpu.baselines.judges; this CLI wires them to a
generation backend:

- ``--backend flax --vlm_checkpoint <blip2 dir>``: TPU-native serving —
  the HF BLIP-2 checkpoint converts into the Flax vision→Q-Former→OPT
  stack (models/blip2.py) and judge prompts decode on-device with
  left-padded greedy generation + transition probabilities (the same
  P(first content token) scoring as the hf backend). VDC's LLM stages can
  ride a host --llm_checkpoint alongside.
- ``--backend hf --vlm_checkpoint <dir> [--llm_checkpoint <dir>]``: local
  HuggingFace checkpoints (host torch fallback; gated — no downloads).
- ``--backend echo``: a deterministic stand-in backend (the VLM answers
  from a caption/image-concept heuristic) so the full loop, outputs, and
  evaluation run anywhere. Scores are meaningless; the plumbing is real.

Outputs: res.pkl ({'df', 'agg_results'}), scores.csv, done — same contract
as the other baselines; val/test splits only (run_llava.py:124).
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="lemon_tpu generative judges")
    p.add_argument("--judge", required=True, choices=["llava", "vdc"])
    p.add_argument("--output_dir", required=True)
    p.add_argument("--dataset", default="synthetic_caption")
    p.add_argument("--noise_type", default="random")
    p.add_argument("--noise_level", type=float, default=0.4)
    p.add_argument("--backend", default="hf", choices=["hf", "flax", "echo"])
    p.add_argument("--get_expl", action="store_true",
                   help="llava: ask for an explanation instead of Yes/No; raw "
                        "replies go to scores.csv, no score eval (run_llava.py:97-99,179)")
    p.add_argument("--vlm_checkpoint", default=None)
    p.add_argument("--llm_checkpoint", default=None)
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug", action="store_true", help="20-sample subset (run_llava.py:85-87)")
    p.add_argument("--platform", default=None)
    p.add_argument("--synthetic_n", type=int, default=200)
    p.add_argument("--specific_qa_csv", default=None,
                   help="VDC per-class QA csv ('builtin' = the vendored "
                        "CIFAR-10 table, lib/vdc/cifar10_specific_InstructBLIP.csv role)")
    p.add_argument("--max_new_tokens", type=int, default=512,
                   help="generation budget (run_llava.py:143); lower for tiny test checkpoints")
    p.add_argument("--generate_batch_size", type=int, default=1,
                   help="pairs (llava) / questions (vdc) per generate call; "
                        ">1 enables left-padded batched decoding — identical "
                        "scoring semantics, fewer forward dispatches than the "
                        "reference's per-sample loop")
    return p


def _echo_backends():
    """Deterministic stand-ins: reply 'Yes' iff a caption word appears in
    the stringified image (works with the synthetic datasets' templates
    only in spirit — intended for plumbing tests)."""

    def vlm_generate(image, prompt):
        caption = prompt.split('"')[1] if '"' in prompt else ""
        h = (hash(caption) ^ hash(bytes(np.asarray(image).tobytes()[:64]))) % 100
        return ("Yes" if h % 2 == 0 else "No"), 0.5 + (h % 50) / 100.0

    def vlm_answer(image, question):
        return f"the image shows something ({hash(question) % 7})"

    def llm_generate(prompt):
        if "generate some visual questions" in prompt:
            return "Is the subject visible?\nIs the scene consistent with the caption?"
        return "yes" if hash(prompt) % 2 == 0 else "no"

    def vlm_generate_batch(images, prompts):
        return [vlm_generate(im, p) for im, p in zip(images, prompts)]

    def vlm_answer_batch(images, questions):
        return [vlm_answer(im, q) for im, q in zip(images, questions)]

    return vlm_generate, vlm_answer, llm_generate, vlm_generate_batch, vlm_answer_batch


def _hf_backends(vlm_checkpoint, llm_checkpoint, max_new_tokens=512):
    """Real HuggingFace backends with reference-faithful answer
    probabilities: greedy generate with output_scores, P(first content
    token) = exp(transition_scores[1]) with a 0.5 fallback for one-token
    replies (run_llava.py:140-161).

    The batched entry points (``vlm_generate_batch``/``vlm_answer_batch``)
    left-pad the prompts and run one generate per chunk — same greedy
    decode and per-row transition scores, fewer forward dispatches than
    the reference's one-sample loop (run_llava.py:128-143)."""
    import torch
    from transformers import AutoModelForImageTextToText, AutoProcessor

    vlm = AutoModelForImageTextToText.from_pretrained(vlm_checkpoint, dtype=torch.float32).eval()
    processor = AutoProcessor.from_pretrained(vlm_checkpoint)
    # decoder-only batched generation needs left padding so every row's
    # last prompt token abuts its first generated token
    processor.tokenizer.padding_side = "left"
    if processor.tokenizer.pad_token_id is None:
        processor.tokenizer.pad_token = processor.tokenizer.eos_token

    def _format(prompt):
        try:
            msgs = [{"role": "user", "content": [{"type": "image"}, {"type": "text", "text": prompt}]}]
            return processor.apply_chat_template(msgs, add_generation_prompt=True)
        except Exception:
            # llava-v1 conversation style (run_llava.py:129-132)
            return f"USER: <image>\n{prompt} ASSISTANT:"

    def _stop_ids():
        """All ids that can terminate a row: tokenizer EOS plus any
        generation_config EOS overrides (e.g. <|eot_id|>-style stop tokens
        that differ from tokenizer.eos_token_id)."""
        ids = set()
        for eos in (processor.tokenizer.eos_token_id, getattr(vlm.generation_config, "eos_token_id", None)):
            if eos is None:
                continue
            ids.update(eos if isinstance(eos, (list, tuple)) else [eos])
        return ids

    def _row_lengths(gen):
        """Generated tokens per row = up to and including the first stop
        token; rows that finish early are pad-filled by generate, so a pad
        token (when distinct from EOS) also marks the end — without this,
        a row stopping at step 0 would read a forced-pad transition score
        instead of the per-sample path's 0.5 fallback."""
        stop_ids = _stop_ids()
        pad = processor.tokenizer.pad_token_id
        lengths = []
        for row in gen.tolist():
            n = len(row)
            for j, tok in enumerate(row):
                if tok in stop_ids or tok == pad:
                    n = j + 1 if tok in stop_ids else j
                    break
            lengths.append(max(n, 0))
        return lengths

    @torch.inference_mode()
    def _vlm_run_batch(images, prompts):
        inputs = processor(
            images=[np.asarray(im) for im in images],
            text=[_format(p) for p in prompts],
            return_tensors="pt", padding=True,
        )
        out = vlm.generate(
            **inputs, do_sample=False, max_new_tokens=max_new_tokens,
            return_dict_in_generate=True, output_scores=True,
        )
        gen = out.sequences[:, inputs["input_ids"].shape[1]:]
        texts = [t.strip() for t in processor.batch_decode(gen, skip_special_tokens=True)]
        ts = vlm.compute_transition_scores(
            out.sequences, out.scores, normalize_logits=True
        ).cpu().numpy()
        lengths = _row_lengths(gen)
        probs = [
            float(np.exp(ts[i, 1])) if lengths[i] > 1 else 0.5
            for i in range(len(texts))
        ]
        return list(zip(texts, probs))

    def vlm_generate(image, prompt):
        return _vlm_run_batch([image], [prompt])[0]

    def vlm_generate_batch(images, prompts):
        return _vlm_run_batch(images, prompts)

    def vlm_answer(image, question):
        return _vlm_run_batch([image], [question])[0][0]

    def vlm_answer_batch(images, questions):
        return [text for text, _ in _vlm_run_batch(images, questions)]

    llm_generate = None
    if llm_checkpoint:
        from transformers import AutoModelForCausalLM, AutoTokenizer

        llm = AutoModelForCausalLM.from_pretrained(llm_checkpoint, dtype=torch.float32).eval()
        llm_tok = AutoTokenizer.from_pretrained(llm_checkpoint)

        @torch.inference_mode()
        def llm_generate(prompt):
            ids = llm_tok(prompt, return_tensors="pt")
            out = llm.generate(**ids, do_sample=False, max_new_tokens=max_new_tokens)
            return llm_tok.decode(out[0, ids["input_ids"].shape[1]:], skip_special_tokens=True)

    return vlm_generate, vlm_answer, llm_generate, vlm_generate_batch, vlm_answer_batch


def _flax_backends(vlm_checkpoint, llm_checkpoint, max_new_tokens=16):
    """TPU-native VLM serving: the HF BLIP-2 checkpoint converted into the
    Flax vision→Q-Former→OPT stack (models/blip2.py), prompts in BLIP-2's
    VQA frame (``Question: ... Answer:``), LEFT-padded batched greedy
    decoding on device with per-step transition log-probs — the same
    P(first content token) scoring as the hf backend (run_llava.py:140-161).
    Tokenization uses the checkpoint's tokenizer when it ships one; tiny
    architecturally-real test checkpoints fall back to the deterministic
    word-hash ids (train/captioning.py convention). VDC's text-only
    VQG/VAE stages ride a host --llm_checkpoint when provided."""
    import jax
    import jax.numpy as jnp

    from lemon_tpu.models.blip2 import Blip2Captioner, load_blip2
    from lemon_tpu.ops.image import preprocess_device
    from lemon_tpu.train.captioning import _hf_tokenizer, _tokenize_captions

    model, params, cfg = load_blip2(vlm_checkpoint)
    hf_tok = _hf_tokenizer(str(vlm_checkpoint))
    # judge prompts are longer than caption training text — widen the
    # tokenization budget to the OPT position table
    import dataclasses as _dc

    prompt_len = max(min(cfg.max_positions - max_new_tokens - cfg.n_queries, 64), 8) if cfg.max_positions else 64
    tok_cfg = _dc.replace(cfg, max_text_len=prompt_len)

    @jax.jit
    def gen(params, pixels, tokens, mask):
        return model.apply(
            params, pixels, tokens, mask, max_new_tokens,
            method=Blip2Captioner.generate_judged,
        )

    def _tokenize_left(prompts):
        """(B, prompt_len) LEFT-padded ids + mask (generation needs every
        row's last prompt token at a fixed position)."""
        ids = _tokenize_captions([f"Question: {p} Answer:" for p in prompts], tok_cfg, str(vlm_checkpoint))
        out = np.full_like(ids, cfg.pad_token_id)
        mask = np.zeros(ids.shape, np.int32)
        for r, row in enumerate(ids):
            valid = row[row != cfg.pad_token_id]  # OPT's <pad> is never a content token
            out[r, len(row) - len(valid):] = valid
            mask[r, len(row) - len(valid):] = 1
        return out, mask

    def _decode_text(rows):
        if hf_tok is not None:
            return [hf_tok.decode([t for t in row if t not in (cfg.pad_token_id,)],
                                  skip_special_tokens=True).strip() for row in rows]
        return [" ".join(str(int(t)) for t in row if t not in (cfg.pad_token_id, cfg.eos_token_id))
                for row in rows]

    def _run_batch(images, prompts):
        pixels = preprocess_device(
            np.stack([np.asarray(_resize_uint8(im, cfg.vision.image_resolution)) for im in images]),
            size=cfg.vision.image_resolution,
        )
        tokens, mask = _tokenize_left(prompts)
        gen_tokens, logprobs = gen(params, pixels, jnp.asarray(tokens), jnp.asarray(mask))
        gen_tokens = np.asarray(gen_tokens)
        logprobs = np.asarray(logprobs)
        texts = _decode_text(gen_tokens)
        probs = []
        for r in range(len(texts)):
            n_gen = int((gen_tokens[r] != cfg.pad_token_id).sum())
            probs.append(float(np.exp(logprobs[r, 1])) if n_gen > 1 else 0.5)
        return list(zip(texts, probs))

    def _resize_uint8(im, size):
        im = np.asarray(im)
        if im.shape[0] == size and im.shape[1] == size:
            return im
        # nearest-neighbor host resize to a stackable shape; the device
        # preprocess then refines (judge images arrive in ragged raw sizes)
        ys = (np.arange(size) * im.shape[0] // size).clip(0, im.shape[0] - 1)
        xs = (np.arange(size) * im.shape[1] // size).clip(0, im.shape[1] - 1)
        return im[ys][:, xs]

    def vlm_generate(image, prompt):
        return _run_batch([image], [prompt])[0]

    def vlm_generate_batch(images, prompts):
        return _run_batch(images, prompts)

    def vlm_answer(image, question):
        return _run_batch([image], [question])[0][0]

    def vlm_answer_batch(images, questions):
        return [t for t, _ in _run_batch(images, questions)]

    llm_generate = None
    if llm_checkpoint:
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        llm = AutoModelForCausalLM.from_pretrained(llm_checkpoint, dtype=torch.float32).eval()
        llm_tok = AutoTokenizer.from_pretrained(llm_checkpoint)

        @torch.inference_mode()
        def llm_generate(prompt):
            ids = llm_tok(prompt, return_tensors="pt")
            out = llm.generate(**ids, do_sample=False, max_new_tokens=max_new_tokens)
            return llm_tok.decode(out[0, ids["input_ids"].shape[1]:], skip_special_tokens=True)

    return vlm_generate, vlm_answer, llm_generate, vlm_generate_batch, vlm_answer_batch


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from lemon_tpu.core import enable_compilation_cache

    enable_compilation_cache()  # compile-dominated wall-clock on remote TPUs

    import pandas as pd

    from lemon_tpu.baselines.common import evaluate_scores
    from lemon_tpu.baselines.judges import VdcPipeline, load_cifar10_specific_questions, run_llava_judge
    from lemon_tpu.core.io import dump_args, mark_done, redirect_output
    from lemon_tpu.data.datasets import get_dataset, load_images

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if not args.debug:
        redirect_output(out_dir)
    random.seed(args.seed)
    np.random.seed(args.seed)
    dump_args(out_dir, vars(args))

    if args.backend == "echo":
        vlm_generate, vlm_answer, llm_generate, vlm_generate_batch, vlm_answer_batch = _echo_backends()
    else:
        if not args.vlm_checkpoint or not Path(args.vlm_checkpoint).exists():
            raise SystemExit(
                f"--backend {args.backend} requires --vlm_checkpoint pointing at a local "
                "checkpoint directory (no network in this environment); use "
                "--backend echo to exercise the pipeline without models."
            )
        backends = _flax_backends if args.backend == "flax" else _hf_backends
        vlm_generate, vlm_answer, llm_generate, vlm_generate_batch, vlm_answer_batch = backends(
            args.vlm_checkpoint, args.llm_checkpoint, max_new_tokens=args.max_new_tokens
        )
        if args.judge == "vdc" and llm_generate is None:
            raise SystemExit(f"--judge vdc with --backend {args.backend} needs --llm_checkpoint (VQG/VAE stages)")

    _, val, test = get_dataset(args.dataset, args.data_seed, noise_level=args.noise_level,
                               noise_type=args.noise_type, synthetic_n=args.synthetic_n)
    # Classification datasets take the reference's clf VQG frame — which,
    # per run_vdc.py:138 + vqg.py, is the CAPTION-worded prompt (the
    # reference's clf/caption prompt naming is inverted; parity keeps it).
    is_clf = not hasattr(val, "sentence")

    def captionize(split):
        """Classification splits judge their LABELS as text: sentence =
        label_set[noisy], gold = label_set[clean] — bare class names, the
        reference's clf-dataset frame (run_vdc.py:88-101); these are also
        the keys of the per-class specific-QA table."""
        if hasattr(split, "sentence"):
            return split
        import numpy as _np

        from lemon_tpu.data.datasets import CaptioningSplit
        from lemon_tpu.data.labels import LABEL_SETS

        names = LABEL_SETS.get(args.dataset, LABEL_SETS["cifar10"])
        return CaptioningSplit(
            sentence=_np.array([names[y] for y in split.y_noisy], object),
            gold_sentence=_np.array([names[y] for y in split.y_clean], object),
            images=split.images,
            paths=split.paths,
        )

    val, test = captionize(val), captionize(test)

    specific_qa = None
    if args.specific_qa_csv:
        specific_qa = load_cifar10_specific_questions(
            None if args.specific_qa_csv == "builtin" else args.specific_qa_csv
        )

    rows = []
    for sset, split in (("val", val), ("test", test)):
        if args.debug:
            split = split.subset(np.arange(min(20, len(split))))
        # per-image list (no stack): VLM processors take ragged raw sizes
        # like the reference's PIL feed; real corpora are heterogeneous
        images = load_images(split, np.arange(len(split)), stack=False)
        captions = list(split.sentence)
        if args.judge == "llava":
            logs = run_llava_judge(
                list(images), captions, vlm_generate, explain=args.get_expl,
                vlm_generate_batch=vlm_generate_batch,
                batch_size=args.generate_batch_size,
            )
            if args.get_expl:
                # Explanation mode: dump raw replies, skip scoring entirely
                # (reference writes the df and exits the eval branch,
                # run_llava.py:179-199).
                rows.append(pd.DataFrame({
                    "sset": sset,
                    "idx": np.arange(len(split)),
                    "actual_label": split.gold_sentence,
                    "noisy_label": split.sentence,
                    "is_mislabel": split.is_mislabel,
                    "raw_output": [l["raw_output"] for l in logs],
                }))
                continue
            scores = [l["score"] for l in logs]
        else:
            pipe = VdcPipeline(
                llm_generate=llm_generate, vlm_answer=vlm_answer, specific_qa=specific_qa,
                vlm_answer_batch=vlm_answer_batch if args.generate_batch_size > 1 else None,
                batch_size=args.generate_batch_size,
            )
            # specific-QA lookup is keyed by the noisy label/caption text
            # (run_vdc.py:126-128 selects per-class questions by the noisy
            # label; for classification-as-caption datasets the caption IS
            # that label string).
            scores = [
                pipe.score_example(images[i], captions[i], label=captions[i], clf=is_clf)["score"]
                for i in range(len(split))
            ]
        rows.append(pd.DataFrame({
            "sset": sset,
            "idx": np.arange(len(split)),
            "actual_label": split.gold_sentence,
            "noisy_label": split.sentence,
            "is_mislabel": split.is_mislabel,
            "pred_score": np.asarray(scores, np.float64),
        }))
    df = pd.concat(rows, ignore_index=True)
    if args.get_expl and args.judge == "llava":
        df.to_csv(out_dir / "scores.csv", index=False)
    else:
        evaluate_scores(df, out_dir)
    mark_done(out_dir)


if __name__ == "__main__":
    main()
