"""QA eval text functions vs the LIVE reference eval_video_qa_result.py.

clean_text (QA variant: first-sentence cut, prompt-echo split, repeated-
token discard) and question_aware_post_processing shape every QA answer
string before scoring (reference eval_video_qa_result.py:45-70,143-153).
The reference module is loaded standalone with its absent spacy import
stubbed; functions are compared output-for-output incl. the None-discard
path and fuzz strings.
"""

import importlib.util
import os
import sys
import types

import pytest

REF = "/root/reference/eval_video_qa_result.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference tree not present")

from vidil_tpu.evals.qa import clean_text_qa, question_aware_post_processing  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    if "spacy" not in sys.modules:
        import importlib.machinery

        stub = types.ModuleType("spacy")
        stub.load = lambda *a, **k: None
        stub.__spec__ = importlib.machinery.ModuleSpec("spacy", loader=None)
        sys.modules["spacy"] = stub
    spec = importlib.util.spec_from_file_location("ref_qa_eval", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


CASES = [
    "A man is playing guitar.",
    "a dog. another sentence here.",
    "answer\n\nObjects: cat, dog\nAttributes: red",
    "first part\n\nFrame Captions: x y z",
    "\n\n  leading whitespace answer  ",
    "no period at all",
    "",
    "word word word word word word word word word",  # 9x repeated -> discard
    "the the the the the the the the the end",       # 'the' is exempt
    ". . . . . . . . .",                             # '.' exempt (pre-split)
    "a a a a a a a a a",                             # 'a' exempt
    "spam spam spam spam spam spam spam eggs",       # 7x: kept
    "multi.  dot. text",
]


@pytest.mark.parametrize("s", CASES)
@pytest.mark.parametrize("fsr", [False, True])
@pytest.mark.parametrize("tfs", [False, True])
def test_clean_text_matches_reference(ref, s, fsr, tfs):
    ours = clean_text_qa(s, filter_short_response=fsr, take_first_sentence=tfs)
    theirs = ref.clean_text(s, filter_short_response=fsr, take_first_sentence=tfs)
    assert ours == theirs


@pytest.mark.parametrize("q,a", [
    ("what is the man doing?", "I'm not sure"),
    ("who is in the video?", "not sure at all"),
    ("what color is it?", "There is no answer"),
    ("what is the man doing?", "playing guitar"),
    ("who is this?", "There is no person"),
    ("where is it?", "not sure"),
    ("doing? who", "not sure"),  # both keys in question: 'doing?' wins
])
def test_postprocessing_matches_reference(ref, q, a):
    assert question_aware_post_processing(q, a) == \
        ref.question_aware_post_processing(q, a)


def test_fuzz_clean_text(ref):
    import random

    words = ["a", "the", "dog", "cat", ".", ",", "spam", "Objects:", "Frame",
             "\n\nObjects:", "\n\nFrame", "no", "answer", "\n", "  "]
    rng = random.Random(13)
    for _ in range(400):
        s = " ".join(rng.choice(words) for _ in range(rng.randint(0, 20)))
        for fsr in (False, True):
            assert clean_text_qa(s, filter_short_response=fsr) == \
                ref.clean_text(s, filter_short_response=fsr), repr(s)
