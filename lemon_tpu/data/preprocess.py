"""Offline metadata preprocessing.

Host-side, one-time builders for the ``multimodal_mislabel_split`` metadata
files the captioning datasets consume (the reference does this in
notebooks/preprocess_*.ipynb; SURVEY.md §2a L6):

- :func:`section_text` / :func:`extract_report_caption` — radiology-report
  section splitting (headers are ALL-CAPS tokens ending in ':' at line
  start) and the FINDINGS/IMPRESSION caption used for MIMIC-CXR
  (notebooks/section_parser.py + preprocess_mimiccxr.ipynb 'parse').
- :func:`extract_nouns` — noun tagging for the 'noun' noise type
  (spaCy-based in the reference; here spaCy when importable, else an
  NLTK-free heuristic fallback flagged in the output).
- :func:`build_caption_metadata` — assemble a
  multimodal_mislabel_split-compatible frame from (path, caption, split)
  rows, with integer noun/category tags.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_SECTION_HEADER = re.compile(r"\n ?([A-Z ()/,-]+):\s")

# Common radiology section aliases -> canonical names (subset of the
# reference's normalize_section_names covering the captions path).
_SECTION_ALIASES = {
    "finding": "findings",
    "findings": "findings",
    "impression": "impression",
    "impressions": "impression",
    "conclusion": "impression",
    "conclusions": "impression",
    "summary": "impression",
}


def section_text(report: str) -> Dict[str, str]:
    """Split a radiology report into {section_name: text}. The text before
    the first header is 'preamble'; a report with no headers maps entirely
    to 'full report'. When a section name repeats, the LAST occurrence wins
    (matching the notebook's list_rindex selection)."""
    sections: Dict[str, str] = {}
    matches = list(_SECTION_HEADER.finditer(report))
    if not matches:
        return {"full report": report}
    sections["preamble"] = report[: matches[0].start(1)]
    for i, m in enumerate(matches):
        name = m.group(1).strip().lower()
        name = _SECTION_ALIASES.get(name, name)
        start = m.end()
        end = matches[i + 1].start() if i + 1 < len(matches) else len(report)
        body = report[start:end].strip()
        if name in ("impression", "findings") and not body:
            continue  # drop empty findings/impression (section_parser behavior)
        sections[name] = body
    return sections


def extract_report_caption(report: str) -> str:
    """FINDINGS + IMPRESSION caption (preprocess_mimiccxr.ipynb 'parse'):
    empty string when neither section exists (those rows are dropped by the
    dataset loader, lib/datasets/utils.py:293)."""
    sections = section_text(report)
    out = ""
    if sections.get("findings"):
        out += "FINDINGS:\n" + sections["findings"] + "\n\n"
    if sections.get("impression"):
        out += "IMPRESSION:\n" + sections["impression"] + "\n"
    return out


_FALLBACK_STOPWORDS = {
    "a", "an", "the", "of", "in", "on", "at", "with", "and", "or", "is",
    "are", "was", "were", "to", "for", "by", "from", "this", "that", "it",
    "its", "his", "her", "their", "there", "some", "two", "three",
}


def extract_nouns(captions: Sequence[str]) -> Tuple[List[List[str]], bool]:
    """Per-caption noun lists. Uses spaCy (en_core_web_sm/trf) when
    available — the reference used en_core_web_trf offline; otherwise a
    heuristic (non-stopword alphabetic tokens) and returns used_spacy=False
    so callers can flag reduced quality."""
    try:
        import spacy

        for model in ("en_core_web_trf", "en_core_web_sm"):
            try:
                nlp = spacy.load(model)
                break
            except OSError:
                nlp = None
        if nlp is not None:
            out = []
            for doc in nlp.pipe(list(captions)):
                out.append([t.lemma_.lower() for t in doc if t.pos_ == "NOUN"])
            return out, True
    except ImportError:
        pass
    out = []
    for caption in captions:
        toks = re.findall(r"[a-zA-Z]+", caption.lower())
        out.append([t for t in toks if t not in _FALLBACK_STOPWORDS and len(t) > 2])
    return out, False


def nouns_to_ints(noun_lists: Sequence[Sequence[str]]) -> Tuple[List[List[int]], Dict[str, int]]:
    """Intern noun strings to integer ids ('nouns_int' column)."""
    vocab: Dict[str, int] = {}
    out = []
    for nouns in noun_lists:
        row = []
        for noun in nouns:
            if noun not in vocab:
                vocab[noun] = len(vocab)
            row.append(vocab[noun])
        out.append(sorted(set(row)))
    return out, vocab


def build_caption_metadata(
    paths: Sequence[str],
    captions: Sequence[str],
    splits: Sequence[str],
    cat_labels: Optional[Sequence[Sequence[int]]] = None,
    extra: Optional[Dict[str, Sequence]] = None,
):
    """Assemble and return a multimodal_mislabel_split-compatible DataFrame
    (columns: filename/path, sentence, split, nouns_int[, cat_labels])."""
    import pandas as pd

    noun_lists, used_spacy = extract_nouns(captions)
    nouns_int, vocab = nouns_to_ints(noun_lists)
    data = {
        "path": list(paths),
        "filename": [Path(p).name for p in paths],
        "sentence": list(captions),
        "split": list(splits),
        "nouns_int": nouns_int,
    }
    if cat_labels is not None:
        data["cat_labels"] = [list(map(int, c)) for c in cat_labels]
    if extra:
        data.update({k: list(v) for k, v in extra.items()})
    df = pd.DataFrame(data)
    df.attrs["noun_vocab"] = vocab
    df.attrs["used_spacy"] = used_spacy
    return df


def save_metadata(df, dataset_root: Path) -> Path:
    out = Path(dataset_root) / "multimodal_mislabel_split.pkl"
    out.parent.mkdir(parents=True, exist_ok=True)
    df.to_pickle(out)
    return out
