"""Judge prompt/parser behavioral tests (driven with scripted fakes) and
offline-preprocessing tests."""

import numpy as np
import pytest

from lemon_tpu.baselines.judges import (
    LLAVA_QUERY,
    VDC_COMMON_QUESTIONS,
    VdcPipeline,
    generate_questions,
    llava_mislabel_score,
    match_common_answer,
    match_specific_answer,
    parse_llava_verdict,
    parse_vqg_output,
    run_llava_judge,
    spell_out_numbers,
    vdc_score,
)
from lemon_tpu.data.preprocess import (
    build_caption_metadata,
    extract_nouns,
    extract_report_caption,
    nouns_to_ints,
    section_text,
)


# ---------------------------------------------------------------------------
# LLaVA judge


def test_llava_verdict_parsing():
    assert parse_llava_verdict("No, the caption is wrong.") == 1
    assert parse_llava_verdict("  no") == 1
    assert parse_llava_verdict("Yes.") == 0
    # reference semantics: any leading 'no' counts, including "Not sure"
    # (run_llava.py parse_output uses startswith('no'))
    assert parse_llava_verdict("Not sure") == 1
    assert parse_llava_verdict(None) == 0


def test_llava_score_direction():
    pred, score = llava_mislabel_score("No", 0.9)
    assert pred == 1 and score == 0.9
    pred, score = llava_mislabel_score("Yes", 0.9)
    assert pred == 0 and score == pytest.approx(0.1)


def test_llava_judge_end_to_end_with_fake_vlm():
    def fake_vlm(image, prompt):
        assert 'Only answer with "Yes" or "No"' in prompt
        # pretend the model answers 'No' when image != caption tag
        return ("No" if image != prompt.split('"')[1] else "Yes"), 0.8

    logs = run_llava_judge(["cat", "dog"], ["cat", "bird"], fake_vlm)
    assert logs[0]["pred"] == 0 and logs[0]["score"] == pytest.approx(0.2)
    assert logs[1]["pred"] == 1 and logs[1]["score"] == pytest.approx(0.8)


# ---------------------------------------------------------------------------
# VDC


def test_vqg_parse_caps_and_cleans():
    text = "Is there a boy?\n| hidden answer: yes |\nIs it red?\n\n" + "\n".join(f"Q{i}?" for i in range(8))
    qs = parse_vqg_output(text)
    assert len(qs) == 6
    assert qs[0] == "is there a boy?"
    assert "hidden answer" not in " ".join(qs)


def test_generate_questions_uses_caption_prompt():
    seen = {}

    def fake_llm(prompt):
        seen["prompt"] = prompt
        return "Is there a dog?\nIs the dog brown?"

    qs = generate_questions("a brown dog", fake_llm, clf=True)
    assert 'The caption is "a brown dog".' in seen["prompt"]
    assert qs == ["is there a dog?", "is the dog brown?"]


def test_specific_answer_matching():
    assert match_specific_answer("There are two dogs", "2")
    assert match_specific_answer("I see a red car", "red")
    assert not match_specific_answer("a blue boat", "red")
    assert spell_out_numbers("0 cats") == "zero none nothing no cats"


def test_common_answer_matching_and_score():
    def fake_llm(prompt):
        if "Labels: [a photo of a cat]" in prompt:
            caption_part = prompt.split("Caption: [")[1].split("]")[0]
            return "yes" if "cat" in caption_part else "no"
        return "Is it fluffy?"

    assert match_common_answer("a cat sitting", "a photo of a cat", fake_llm)
    assert not match_common_answer("a dog", "a photo of a cat", fake_llm)

    score = vdc_score("a photo of a cat", ["a cat", "a dog"], ["two"], ["2"], fake_llm)
    # matches: 1 common of 2, 1 specific of 1 -> 1 - 2/3
    assert score == pytest.approx(1 / 3)


def test_vdc_pipeline_end_to_end():
    def fake_llm(prompt):
        if "generate some visual questions" in prompt:
            return "Is there a cat?\nIs it furry?"
        caption_part = prompt.split("Caption: [")[1].split("]")[0]
        return "yes" if "cat" in caption_part else "no"

    def fake_vlm(image, question):
        return f"the image shows a {image}"

    pipe = VdcPipeline(llm_generate=fake_llm, vlm_answer=fake_vlm,
                       specific_qa={"cat": [("How many legs?", "4")]})
    good = pipe.score_example("cat", "a photo of a cat", label="cat")
    bad = pipe.score_example("dog", "a photo of a cat", label="cat")
    assert good["score"] < bad["score"]
    # 2 fixed common describe-questions + 1 canned specific; the canned
    # table suppresses VQG entirely (run_vdc.py:136)
    assert good["questions"][:2] == list(VDC_COMMON_QUESTIONS)
    assert good["questions"][2:] == ["How many legs?"]

    # Batched VQA path: one call answers all of an example's questions
    # (common + specific) and reproduces the per-question results exactly.
    calls = []

    def fake_vlm_batch(images, questions):
        calls.append(len(questions))
        return [fake_vlm(im, q) for im, q in zip(images, questions)]

    batched = VdcPipeline(llm_generate=fake_llm, vlm_answer=fake_vlm,
                          vlm_answer_batch=fake_vlm_batch,
                          specific_qa={"cat": [("How many legs?", "4")]})
    assert batched.score_example("cat", "a photo of a cat", label="cat") == good
    assert batched.score_example("dog", "a photo of a cat", label="cat") == bad
    assert calls == [3, 3]  # 2 common + 1 specific, one VLM call per example


def test_vdc_composition_matches_reference():
    """Question composition parity with run_vdc.py:123-166: the canned
    table suppresses VQG; without a table entry VQG fires with the
    caller's clf frame; expected specific answers are always 'yes'
    (run_vdc.py:166 passes ['yes']*len even for the canned table)."""
    vqg_prompts = []

    def fake_llm(prompt):
        if "generate some visual questions" in prompt:
            vqg_prompts.append(prompt)
            return "Is there a dog?"
        return "no"

    def fake_vlm(image, question):
        return "yes it shows a dog"  # token-matches 'yes'

    pipe = VdcPipeline(llm_generate=fake_llm, vlm_answer=fake_vlm,
                       specific_qa={"cat": [("How many legs?", "4")]})
    # table hit: no VQG call
    out = pipe.score_example("img", "cat", label="cat", clf=True)
    assert vqg_prompts == []
    assert out["questions"] == list(VDC_COMMON_QUESTIONS) + ["How many legs?"]
    # the specific response matches 'yes' (not the table's '4'): score
    # counts it as a match -> 1 - 1/3
    assert out["score"] == pytest.approx(1 - 1 / 3)
    # table miss + clf=True: VQG fires with the caption-frame prompt
    # (the reference's inverted naming, vqg.py clf=True branch)
    out = pipe.score_example("img", "dog", label="dog", clf=True)
    assert len(vqg_prompts) == 1 and 'The caption is "dog".' in vqg_prompts[0]
    # caption datasets (clf=False): label-frame prompt
    pipe.score_example("img", "a brown dog", label=None)
    assert 'The label is "a brown dog".' in vqg_prompts[1]


def test_run_judges_classification_dataset_with_builtin_qa(tmp_path):
    """Classification splits judge their labels as text (run_vdc.py:88-101):
    sentences are bare class names, which are exactly the builtin QA
    table's keys — the per-class specific questions must actually fire."""
    import pickle

    from lemon_tpu.cli.run_judges import main
    from lemon_tpu.data.labels import LABEL_SETS

    out = tmp_path / "vdc_clf"
    main([
        "--judge", "vdc", "--output_dir", str(out), "--backend", "echo",
        "--dataset", "synthetic", "--noise_type", "symmetric",
        "--specific_qa_csv", "builtin", "--synthetic_n", "60", "--debug",
    ])
    assert (out / "done").exists()
    df = pickle.load(open(out / "res.pkl", "rb"))["df"]
    names = set(LABEL_SETS["cifar10"])
    assert set(df["noisy_label"]).issubset(names)  # captionized labels
    # echo backend: 2 common questions -> without specific QA every score
    # is a multiple of 1/2; specific QA adds 4 answers -> granularity 1/6
    sixths = np.round(df["pred_score"].to_numpy() * 6)
    np.testing.assert_allclose(df["pred_score"].to_numpy(), sixths / 6, atol=1e-9)
    assert any(s not in (0.0, 0.5, 1.0) for s in df["pred_score"])


def test_vendored_cifar10_specific_qa():
    """The vendored VDC QA table loads with integer labels mapped to the
    CIFAR-10 class names (run_vdc.py:126-128 cifar10_labels[x])."""
    from lemon_tpu.baselines.judges import load_cifar10_specific_questions
    from lemon_tpu.data.labels import LABEL_SETS

    qa = load_cifar10_specific_questions()
    assert set(qa) == set(LABEL_SETS["cifar10"])
    assert all(len(v) == 4 for v in qa.values())
    q, a = qa["airplane"][0]
    assert "airplane" in q and a == "yes"
    # custom CSV with string labels passes through unmapped
    import tempfile
    from pathlib import Path

    p = Path(tempfile.mkdtemp()) / "qa.csv"
    p.write_text("label,question,answer\ncat,Is it a cat?,yes\n")
    qa2 = load_cifar10_specific_questions(p)
    assert qa2 == {"cat": [("Is it a cat?", "yes")]}


# ---------------------------------------------------------------------------
# preprocessing


REPORT = """EXAMINATION: Chest radiograph.

 COMPARISON: None.

 FINDINGS: The lungs are clear. No effusion.

 IMPRESSION: No acute cardiopulmonary process.
"""


def test_section_text_and_caption():
    sections = section_text(REPORT)
    assert "findings" in sections and "impression" in sections
    assert sections["findings"].startswith("The lungs are clear")
    caption = extract_report_caption(REPORT)
    assert caption.startswith("FINDINGS:\n")
    assert "IMPRESSION:\nNo acute cardiopulmonary process." in caption
    # no headers -> full report; no findings/impression -> empty caption
    assert section_text("just text") == {"full report": "just text"}
    assert extract_report_caption("just text") == ""


def test_extract_nouns_and_interning():
    nouns, used_spacy = extract_nouns(["A red car near the house", "a car and a dog"])
    assert "car" in nouns[0] and "house" in nouns[0]
    ints, vocab = nouns_to_ints(nouns)
    assert vocab["car"] == ints[0][ints[0].index(vocab["car"])]
    assert set(ints[1]) & set(ints[0])  # 'car' shared


def test_build_caption_metadata():
    df = build_caption_metadata(
        ["/a/img1.jpg", "/a/img2.jpg"],
        ["a red car", "a blue boat"],
        ["train", "val"],
        cat_labels=[[1], [2]],
    )
    for col in ("path", "filename", "sentence", "split", "nouns_int", "cat_labels"):
        assert col in df.columns
    assert df.attrs["noun_vocab"]
