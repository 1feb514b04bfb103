"""Per-dataset preprocessing builders (round-1 verdict missing #5): tiny
synthetic raw sources shaped exactly like the real ones (Karpathy split
JSON, COCO instances JSON, ImageNetRed annotations, CC3M webdataset
extract, MM-IMDB crawl) must regenerate loader-consumable
multimodal_mislabel_split files."""

import json

import numpy as np
import pandas as pd
import pytest

from lemon_tpu.data.preprocess import (
    build_cc3m,
    build_flickr30,
    build_imagenet_red,
    build_mmimdb,
    build_mscoco,
    section_text,
)


def _karpathy_json(tmp_path, name, n=8, id_key="cocoid"):
    rng = np.random.default_rng(0)
    images = []
    for i in range(n):
        images.append({
            id_key: i,
            "filepath": "train2014" if i % 2 == 0 else "val2014",
            "filename": f"img_{i:06d}.jpg",
            "split": ["train", "val", "test", "restval"][i % 4],
            "sentences": [
                {"raw": f"a {w} photo number {i}", "tokens": ["a", w, "photo"]}
                for w in rng.choice(["red bird", "blue car", "old tree"], size=3)
            ],
        })
    p = tmp_path / f"dataset_{name}.json"
    p.write_text(json.dumps({"images": images, "dataset": name}))
    return p


def test_build_mscoco(tmp_path):
    kp = _karpathy_json(tmp_path, "coco")
    inst = tmp_path / "instances_train2014.json"
    inst.write_text(json.dumps({
        "annotations": [
            {"image_id": i, "category_id": (i % 3) + 1, "id": 100 + i} for i in range(6)
        ] + [{"image_id": 0, "category_id": 2, "id": 999}],
        "categories": [{"id": 1, "name": "bird"}, {"id": 2, "name": "car"}, {"id": 3, "name": "tree"}],
    }))
    df = build_mscoco(kp, [inst], out_root=tmp_path / "coco_root")
    df = pd.read_pickle(tmp_path / "coco_root" / "multimodal_mislabel_split.pkl")
    for col in ("sentence", "cat_labels", "cat_labels_text", "nouns_int", "split", "filepath", "filename"):
        assert col in df.columns, col
    # image 0 has categories {1, 2}; images 6,7 have none -> []
    assert sorted(df.loc[0, "cat_labels"]) == [1, 2]
    assert list(df.loc[7, "cat_labels"]) == []
    assert list(df.loc[7, "cat_labels_text"]) == []  # not NaN (was a bug)
    assert df.loc[0, "cat_labels_text"][0] in ("bird", "car")
    # caption picked from this image's own sentences
    for i in range(8):
        assert df.loc[i, "sentence"] in {s["raw"] for s in df.loc[i, "sentences"]}
    # deterministic caption selection (np.random.seed(42) stream)
    df2 = build_mscoco(kp, [inst])
    assert list(df2["sentence"]) == list(df["sentence"])


def test_build_mscoco_categories_merge_across_files(tmp_path):
    """Category names resolve across ALL instances files, not just the
    last one (train/val categories merged; was a bug)."""
    kp = _karpathy_json(tmp_path, "coco")
    inst_a = tmp_path / "instances_a.json"
    inst_a.write_text(json.dumps({
        "annotations": [{"image_id": 0, "category_id": 7, "id": 1}],
        "categories": [{"id": 7, "name": "dog"}],
    }))
    inst_b = tmp_path / "instances_b.json"
    inst_b.write_text(json.dumps({
        "annotations": [{"image_id": 1, "category_id": 8, "id": 2}],
        "categories": [{"id": 8, "name": "cat"}],
    }))
    df = build_mscoco(kp, [inst_a, inst_b])
    assert list(df.loc[0, "cat_labels_text"]) == ["dog"]
    assert list(df.loc[1, "cat_labels_text"]) == ["cat"]


def test_build_flickr30_and_loader_roundtrip(tmp_path, monkeypatch):
    kp = _karpathy_json(tmp_path, "flickr30k", id_key="imgid")
    root = tmp_path / "data" / "flickr30k"
    build_flickr30(kp, out_root=root)
    df = pd.read_pickle(root / "multimodal_mislabel_split.pkl")
    assert "cat_labels" not in df.columns
    assert all(isinstance(x, list) for x in df["nouns_int"])

    # the dataset loader consumes the regenerated pickle (restval -> train)
    monkeypatch.setenv("LEMON_TPU_DATA_ROOT", str(tmp_path / "data"))
    from lemon_tpu.data.datasets import load_captioning_dataset

    train, val, test = load_captioning_dataset("flickr30k", 0, 0.5, "random")
    assert len(train) + len(val) + len(test) == 8
    assert len(train) == 4  # 2 train + 2 restval


def test_build_imagenet_red(tmp_path):
    ann = tmp_path / "stanford-cars-annotations.json"
    ann.write_text(json.dumps({
        "data": [
            [{"url": f"http://x/{i}.jpg", "id": i, "label": f"car_{i % 3}", "is_clean": i % 2}]
            for i in range(6)
        ]
    }))
    img_dir = tmp_path / "imgs"
    sub = img_dir / "a"
    sub.mkdir(parents=True)
    for i in (0, 2, 3, 5):  # images 1 and 4 were never downloaded
        (sub / f"{i}.jpg").write_bytes(b"\xff\xd8fake")
    df = build_imagenet_red(ann, img_dir)
    assert list(df.columns) == ["index", "url", "id", "label", "is_clean", "path"]
    assert len(df) == 4  # missing images dropped
    assert set(df["id"]) == {0, 2, 3, 5}
    assert (img_dir / "multimodal_mislabel_split.csv").exists()


def test_build_cc3m(tmp_path):
    d = tmp_path / "wds" / "00000"
    d.mkdir(parents=True)
    for i in range(5):
        (d / f"{i:09d}.jpg").write_bytes(b"\xff\xd8fake")
        if i != 3:  # one image without a caption sidecar
            (d / f"{i:09d}.txt").write_text(f"caption number {i}")
    df = build_cc3m(tmp_path / "wds", out_root=tmp_path / "cc3m_root")
    df = pd.read_pickle(tmp_path / "cc3m_root" / "multimodal_mislabel_split.pkl")
    assert len(df) == 4
    assert (df["split"] == "train").all()
    assert (df["gold_sentence"] == "").all()
    assert df["sentence"].str.startswith("caption").all()


def test_build_mmimdb(tmp_path):
    root = tmp_path / "mmimdb"
    (root / "dataset").mkdir(parents=True)
    ids = []
    for i in range(6):
        mid = f"0{i}00000"
        ids.append(mid)
        (root / "dataset" / f"{mid}.json").write_text(json.dumps({
            "genres": ["Drama"] if i % 2 else ["Comedy", "Drama"],
            "title": f"Movie {i}",
            "plot": [f"long plot {i}", "second paragraph"],
            **({"plot outline": f"a short outline about a dog {i}"} if i != 5 else {}),
        }))
    (root / "split.json").write_text(json.dumps({
        "train": ids[:3], "dev": ids[3:4], "test": ids[4:],
    }))
    df = build_mmimdb(root, out_root=tmp_path / "out")
    df = pd.read_pickle(tmp_path / "out" / "multimodal_mislabel_split.pkl")
    assert len(df) == 6
    assert set(df["split"]) == {"train", "val", "test"}
    assert (df["split"] == "train").sum() == 3
    # genres map to stable integer ids: Comedy=0, Drama=1 (sorted unique)
    comedy_rows = df[df["title"] == "Movie 0"]
    assert sorted(comedy_rows.iloc[0]["cat_labels"]) == [0, 1]
    # missing plot outline -> empty string, sentence mirrors it
    assert df[df["title"] == "Movie 5"].iloc[0]["sentence"] == ""
    assert "\n" in df.iloc[0]["all_text"]


def test_build_mimiccxr(tmp_path):
    """MIMIC-CXR builder: CheXpert certainty label sets, report-section
    captions w/ custom-rule overrides + last-paragraph fallback, split
    renaming (preprocess_mimiccxr.ipynb)."""
    from lemon_tpu.data.preprocess import build_mimiccxr, extract_mimic_caption

    jpg = tmp_path / "jpg"
    reports = tmp_path / "reports"
    jpg.mkdir()
    rows = [
        # (subject, study, Atelectasis, Edema, Pneumonia)
        (10000001, 50000001, 1.0, -1.0, np.nan),
        (10000002, 50000002, np.nan, 0.0, 1.0),
        (11573679, 58235663, 1.0, np.nan, np.nan),  # custom [0,0] -> empty caption
    ]
    chex = pd.DataFrame(rows, columns=["subject_id", "study_id", "Atelectasis", "Edema", "Pneumonia"])
    chex.to_csv(jpg / "mimic-cxr-2.0.0-chexpert.csv.gz", index=False)
    pd.DataFrame({
        "subject_id": [r[0] for r in rows],
        "study_id": [r[1] for r in rows],
        "split": ["train", "validate", "test"],
    }).to_csv(jpg / "mimic-cxr-2.0.0-split.csv.gz", index=False)
    # Real MIMIC-CXR reports indent every line; headers are only parsed
    # after '\n ' (MIT-LCP p_section — an unindented first-line header is
    # part of the 'full report'/preamble).
    texts = {
        (10000001, 50000001): "EXAM: chest\n\n FINDINGS: Clear lungs.\n\n IMPRESSION: No acute disease.\n",
        # no findings/impression sections; final paragraph after a '\n \n'
        # separator becomes the IMPRESSION (MIT-LCP last_paragraph rule)
        (10000002, 50000002): "INDICATION: cough\n \nStable appearance overall.",
        (11573679, 58235663): "Nothing useful here.",
    }
    for (subj, study), txt in texts.items():
        d = reports / f"p{str(subj)[:2]}" / f"p{subj}"
        d.mkdir(parents=True, exist_ok=True)
        (d / f"s{study}.txt").write_text(txt)

    df = build_mimiccxr(jpg, reports, out_root=tmp_path / "out")
    df = pd.read_pickle(tmp_path / "out" / "multimodal_mislabel_split.pkl")
    assert list(df.split) == ["train", "val", "test"]
    r0 = df[df.study_id == 50000001].iloc[0]
    assert "certain_yes_Atelectasis" in r0.cat_labels_text
    assert "certain_no_Edema" in r0.cat_labels_text
    assert not any("Pneumonia" in t for t in r0.cat_labels_text)  # NaN absent
    assert "FINDINGS:" in r0.sentence and "No acute disease." in r0.sentence
    # neither findings nor impression -> last-paragraph fallback
    r1 = df[df.study_id == 50000002].iloc[0]
    assert "IMPRESSION:" in r1.sentence and "Stable appearance overall." in r1.sentence
    assert "FINDINGS:" not in r1.sentence
    # a findings-only report does NOT duplicate its tail into IMPRESSION
    from lemon_tpu.data.preprocess import extract_mimic_caption as emc

    cap = emc("s99999999", "chest exam\n FINDINGS: Mild edema.\n\nStable appearance overall.")
    assert cap.count("Stable appearance overall.") == 1 and "IMPRESSION" not in cap
    # custom [0,0] index override -> empty-body IMPRESSION
    r2 = df[df.study_id == 58235663].iloc[0]
    assert r2.sentence.strip() == "IMPRESSION:"
    # ints match the certainty x label vocabulary positions
    assert extract_mimic_caption("s51966317", "history\n INDICATION: chest pain\n\n FINDINGS: x\n").startswith("IMPRESSION: \nchest pain")
    # unindented first-line headers are NOT sections (MIT-LCP requires
    # '\n '): a header-first stripped report falls back to full-report
    assert "full report" in section_text("FINDINGS: at line start")
    # repeated header name: the fallback must read the PHYSICALLY last
    # section (MIT-LCP keeps sections as lists; section_parser.py:80-87),
    # not the dict entry whose first occurrence came earlier
    cap = emc(
        "s00000001",
        "preamble\n EXAMINATION: a\n TECHNIQUE: b\n EXAMINATION: c\n \nStable overall.",
    )
    assert "IMPRESSION:\nStable overall." in cap
    # empty last paragraph still emits 'IMPRESSION:\n\n' (row kept, the
    # notebook's parse appends unconditionally when the section exists)
    cap = emc("s00000002", "note\n EXAMINATION: a\n \n  ")
    assert cap == "IMPRESSION:\n\n"
