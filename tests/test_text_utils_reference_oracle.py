"""pre_caption / pre_caption_minimum / pre_question vs the LIVE reference.

These preprocessors gate every caption/question byte fed to training and
eval (reference data/utils.py:35-100); the existing hand cases in
test_datasets.py pin a few examples — here the reference module itself is
loaded (its torch-less text functions, with torchvision/pycoco* deps
auto-stubbed) and fuzz-compared string-for-string, so a transcription
error in either regex cannot hide.
"""

import importlib.util
import os
import re
import sys
import types

import pytest

REF = "/root/reference/data/utils.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference tree not present")

from vidil_tpu.data.text_utils import (  # noqa: E402
    pre_caption,
    pre_caption_minimum,
    pre_question,
)


def _load_reference():
    """Load data/utils.py standalone, fabricating any missing torch-side
    dependency module (torchvision/pycocotools/pycocoevalcap are absent
    in this env; only the pure-text functions are exercised)."""
    sys.path.insert(0, "/root/reference")
    allowed = ("torchvision", "pycocotools", "pycocoevalcap")
    for _ in range(40):
        spec = importlib.util.spec_from_file_location("ref_data_utils", REF)
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
            return mod
        except ModuleNotFoundError as e:
            if not any(e.name.startswith(p) for p in allowed):
                raise
            stub = types.ModuleType(e.name)
            stub.__path__ = []
            sys.modules[e.name] = stub
            parent, _, child = e.name.rpartition(".")
            if parent in sys.modules:
                setattr(sys.modules[parent], child, stub)
        except ImportError as e:
            m = re.search(r"cannot import name '(\w+)' from '([\w\.]+)'", str(e))
            if not m or not any(m.group(2).startswith(p) for p in allowed):
                raise
            setattr(sys.modules[m.group(2)], m.group(1), object())
    raise RuntimeError("could not stub reference deps")


@pytest.fixture(scope="module")
def ref():
    return _load_reference()


CASES = [
    "A Dog! Runs. (fast)",
    "many   spaces\n",
    "trailing newline\n\n",
    "  leading and trailing  ",
    'quotes "inside" and *stars* #tags ~tilde;',
    "colons: semicolons; periods. bangs!",
    "UPPER lower MiXeD",
    "unicode café naïve 日本語",
    "tabs\tand\nnewlines\r\n",
    "",
    "   ",
    "word " * 60,  # > max_words
    "a.b.c...d",
    "(parens) (more) ((nested))",
    "hy-phen under_score slash/back\\slash",
    "question? marks?? stay!",
    "apostrophe's and commas, stay",
]


@pytest.mark.parametrize("s", CASES)
def test_pre_caption_matches_reference(ref, s):
    assert pre_caption(s) == ref.pre_caption(s)
    assert pre_caption(s, max_words=3) == ref.pre_caption(s, max_words=3)


@pytest.mark.parametrize("s", CASES)
def test_pre_caption_minimum_matches_reference(ref, s):
    assert pre_caption_minimum(s) == ref.pre_caption_minimum(s)


@pytest.mark.parametrize("s", CASES)
def test_pre_question_matches_reference(ref, s):
    assert pre_question(s) == ref.pre_question(s)


def test_fuzz_matches_reference(ref):
    import random

    alphabet = list("abcXYZ 0189.!?\"()*#:;~,-_'\n\t\r/\\") + ["  ", "..", "é"]
    rng = random.Random(77)
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        mw = rng.choice([2, 10, 50])
        assert pre_caption(s, mw) == ref.pre_caption(s, mw), repr(s)
        assert pre_caption_minimum(s, mw) == ref.pre_caption_minimum(s, mw), repr(s)
        assert pre_question(s) == ref.pre_question(s), repr(s)
