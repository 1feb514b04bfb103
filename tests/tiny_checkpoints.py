"""Builders for tiny random-weight HuggingFace checkpoints.

The judge baselines (run_llava.py, run_vdc.py) are driven through the REAL
transformers load/generate/transition-score path; since this environment has
no network and no cached checkpoints, these builders materialize miniature
but architecturally-real models on disk:

- :func:`build_tiny_vlm`: LlavaForConditionalGeneration (CLIP ViT vision
  tower + Llama LM + projector) with a from-scratch-trained BPE tokenizer.
- :func:`build_tiny_llm`: LlamaForCausalLM with the same tokenizer.

Outputs are garbage (random weights) but every code path — processor image
token expansion, greedy generate, compute_transition_scores — is the one a
real LLaVA checkpoint exercises.
"""

from __future__ import annotations

from pathlib import Path

_CORPUS = [
    "Yes No yes no the image shows a photo of a cat dog plane bird horse ship truck deer frog car",
    'The proposed caption for this image is "a photo". Is this caption correct? Only answer with "Yes" or "No".',
    "USER ASSISTANT please generate some visual questions to ask a multimodal large language model",
    "Is there a boy in the picture? Is the object visible in the scene?",
]


def build_tokenizer(out_dir: Path):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import LlamaTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<unk>", "<s>", "</s>", "<pad>", "<image>"]
    )
    tok.train_from_iterator(_CORPUS, trainer)
    fast = LlamaTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>", eos_token="</s>", pad_token="<pad>"
    )
    fast.save_pretrained(str(out_dir))
    return fast


def _tiny_llama_config(vocab_size: int):
    from transformers import LlamaConfig

    return LlamaConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        vocab_size=vocab_size,
        max_position_embeddings=512,
    )


def build_tiny_vlm(out_dir) -> str:
    """LLaVA-architecture checkpoint + processor at toy scale."""
    import torch
    from transformers import (
        CLIPImageProcessor,
        CLIPVisionConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
        LlavaProcessor,
    )

    out_dir = Path(out_dir)
    tok = build_tokenizer(out_dir)
    vis = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8, projection_dim=32,
    )
    cfg = LlavaConfig(
        vision_config=vis,
        text_config=_tiny_llama_config(len(tok)),
        image_token_index=tok.convert_tokens_to_ids("<image>"),
        vision_feature_select_strategy="default",
        vision_feature_layer=-1,
    )
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg)
    image_processor = CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32}
    )
    processor = LlavaProcessor(
        image_processor=image_processor,
        tokenizer=tok,
        patch_size=8,
        vision_feature_select_strategy="default",
        num_additional_image_tokens=1,  # the CLS token "default" drops
    )
    model.save_pretrained(str(out_dir))
    processor.save_pretrained(str(out_dir))
    return str(out_dir)


def build_tiny_blip_itm(out_dir) -> str:
    """BLIP image-text-retrieval checkpoint (the CapFilt ITM scorer's
    architecture, Salesforce/blip-itm-base-coco role) at toy scale: vision
    tower + text encoder with cross-attention + the 2-way itm_score head.
    Drives the real AutoProcessor/BlipForImageTextRetrieval path in
    baselines/capfilt.py:hf_blip_itm_scorer."""
    import torch
    from transformers import (
        BertTokenizerFast,
        BlipConfig,
        BlipForImageTextRetrieval,
        BlipImageProcessor,
        BlipProcessor,
        BlipTextConfig,
        BlipVisionConfig,
    )

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    # BLIP's text side is BERT-style; build a tiny WordPiece vocab.
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[DEC]", "[ENC]"] + [
        w for line in _CORPUS for w in line.lower().replace('"', " ").replace(".", " ").split()
    ]
    seen = []
    for w in vocab:
        if w not in seen:
            seen.append(w)
    (out_dir / "vocab.txt").write_text("\n".join(seen) + "\n")
    tok = BertTokenizerFast(str(out_dir / "vocab.txt"))
    txt = BlipTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, encoder_hidden_size=32, vocab_size=len(tok),
        max_position_embeddings=64,
    )
    vis = BlipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
    )
    cfg = BlipConfig(text_config=txt.to_dict(), vision_config=vis.to_dict(), image_text_hidden_size=16)
    torch.manual_seed(2)
    model = BlipForImageTextRetrieval(cfg)
    processor = BlipProcessor(
        image_processor=BlipImageProcessor(size={"height": 32, "width": 32}),
        tokenizer=tok,
    )
    model.save_pretrained(str(out_dir))
    processor.save_pretrained(str(out_dir))
    return str(out_dir)


def build_tiny_llm(out_dir) -> str:
    """Plain Llama causal LM sharing the tiny tokenizer."""
    import torch
    from transformers import LlamaForCausalLM

    out_dir = Path(out_dir)
    tok = build_tokenizer(out_dir)
    torch.manual_seed(1)
    model = LlamaForCausalLM(_tiny_llama_config(len(tok)))
    model.save_pretrained(str(out_dir))
    return str(out_dir)


if __name__ == "__main__":
    import sys

    base = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_ckpts")
    print(build_tiny_vlm(base / "vlm"))
    print(build_tiny_llm(base / "llm"))
