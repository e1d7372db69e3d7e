"""Tricky-case corpus for the rule-based sentence splitter.

The reference splits with spaCy's trained senter
(run_video_CapFilt.py:142,166-175; pretrain_video.py:30-44); offline the
rule-based fallback must handle the constructs the old bare
``(?<=[.!?])\\s+`` regex got wrong: abbreviations, initials, decimals,
ellipses, and quote/bracket attachment.
"""

import warnings

import pytest

from vidil_tpu.pipeline.sentences import (
    _warn_fallback_once,
    split_sentences,
    split_sentences_rules,
)

CASES = [
    # caption-style lowercase streams split on every boundary
    ("a man sings. a woman dances. a dog barks",
     ["a man sings.", "a woman dances.", "a dog barks"]),
    # abbreviations do not split
    ("Mr. Smith talks to Dr. Jones about the game.",
     ["Mr. Smith talks to Dr. Jones about the game."]),
    ("they sell fruit, vegetables, etc. at the market. people browse",
     ["they sell fruit, vegetables, etc. at the market.", "people browse"]),
    # single-letter initials
    ("J. Smith throws the ball. the crowd cheers",
     ["J. Smith throws the ball.", "the crowd cheers"]),
    # dotted acronyms
    ("a parade in the U.S. capital. flags wave",
     ["a parade in the U.S. capital.", "flags wave"]),
    # decimals never split (no whitespace after the period)
    ("the runner finishes in 9.58 seconds. everyone claps",
     ["the runner finishes in 9.58 seconds.", "everyone claps"]),
    # ellipsis continuing into lowercase does not split
    ("the car slows down... then speeds up again",
     ["the car slows down... then speeds up again"]),
    # ellipsis before an uppercase start splits
    ("he waits... Then he jumps",
     ["he waits...", "Then he jumps"]),
    # closing quote attaches to the preceding sentence
    ('she says "stop." the music ends',
     ['she says "stop."', "the music ends"]),
    # closing bracket attaches left
    ("the team wins (again). fans celebrate",
     ["the team wins (again).", "fans celebrate"]),
    # exclamation/question always split
    ("what a goal! the keeper dives. did he save it? no",
     ["what a goal!", "the keeper dives.", "did he save it?", "no"]),
    # no terminal punctuation: one sentence
    ("a single caption without punctuation",
     ["a single caption without punctuation"]),
    # multiple spaces between sentences
    ("first part.   second part",
     ["first part.", "second part"]),
    ("", []),
]


@pytest.mark.parametrize("text,expected", CASES, ids=[c[0][:30] for c in CASES])
def test_split_sentences_rules(text, expected):
    assert split_sentences_rules(text) == expected


def test_split_sentences_dispatch_matches_rules_offline():
    # spaCy is absent in this environment: the public entry point must
    # produce the rules output (and not crash trying to download models)
    text = "a man sings. a woman dances"
    assert split_sentences(text) == split_sentences_rules(text)


def test_fallback_warns_once():
    import vidil_tpu.pipeline.sentences as S

    S._warned = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _warn_fallback_once()
        _warn_fallback_once()
    assert len(rec) == 1
    assert "sentencizer" in str(rec[0].message)


def test_capfilt_reexport_and_frame_selection_share_splitter():
    from vidil_tpu.pipeline.capfilt import split_sentences as cap_split
    from vidil_tpu.train import frame_selection

    assert cap_split is split_sentences
    assert frame_selection.split_sentences is split_sentences
