"""lemon_tpu: a TPU-native framework for multimodal label-error detection.

Re-implements the capabilities of MLforHealth/LEMoN (ICML 2025, arXiv
2407.18941) as an idiomatic JAX/XLA/Pallas/pjit stack:

- ``lemon_tpu.models``  — Flax CLIP towers + BPE tokenizer + checkpoint loaders
- ``lemon_tpu.ops``     — Pallas kernels (fused attention, matmul+top-k, image ops)
- ``lemon_tpu.knn``     — exact nearest-neighbor index, single-chip and mesh-sharded
- ``lemon_tpu.scoring`` — LEMoN score, hyperparameter optimization, metric suite
- ``lemon_tpu.data``    — dataset registry, noise injection, device preprocessing
- ``lemon_tpu.train``   — contrastive CLIP trainer and downstream filter-then-train
- ``lemon_tpu.baselines`` — detection baselines (d1-only, CLIP logits, discrepancy, ...)
- ``lemon_tpu.cli``     — run_lemon-compatible entry points and sweep orchestration
"""

__version__ = "0.1.0"
