"""Phonemizer tests: dictionary lookup, boundaries, serialization."""

import os
import random

import pytest

from helpers import tiny_hparams

from daft_exprt_tpu.symbols import EOS, WHITESPACE
from daft_exprt_tpu.text.phonemizer import (load_pronunciation_dict,
                                            parse_phonemized_line,
                                            phonemize_sentence,
                                            serialize_phonemized)


@pytest.fixture
def dict_hp(tmp_path):
    hp = tiny_hparams()
    d = tmp_path / "english.dict"
    d.write_text(
        "this\tDH IH1 S\n"
        "is\tIH1 Z\n"
        "a\tAH0\n"
        "test\tT EH1 S T\n"
        "tomato\tT AH0 M EY1 T OW2\n"
        "tomato\tT AH0 M AA1 T OW2\n"
    )
    hp.mfa_dictionary = str(d)
    return hp


def test_phonemize_basic(dict_hp):
    out = phonemize_sentence("This is a test.", dict_hp,
                             rng=random.Random(0))
    assert out[0] == ["DH", "IH1", "S"]
    assert out[1] == WHITESPACE
    # trailing punctuation becomes the last boundary before EOS
    assert out[-2] == "."
    assert out[-1] == EOS


def test_phonemize_pronunciation_variants(dict_hp):
    variants = set()
    for seed in range(20):
        out = phonemize_sentence("tomato.", dict_hp,
                                 rng=random.Random(seed))
        variants.add(tuple(out[0]))
    assert len(variants) == 2  # both dictionary entries get sampled


def test_phonemize_oov_raises_without_g2p(dict_hp):
    with pytest.raises(ValueError, match="zebra"):
        phonemize_sentence("a zebra.", dict_hp, rng=random.Random(0))


def test_serialize_parse_roundtrip(dict_hp):
    out = phonemize_sentence("This is a test!", dict_hp,
                             rng=random.Random(0))
    line = serialize_phonemized(out)
    assert "{DH IH1 S}" in line
    parsed = parse_phonemized_line(line)
    assert parsed == out


def test_parse_handles_adjacent_word_groups():
    parsed = parse_phonemized_line("{HH AY1} {DH EH1 R} ? ~")
    assert parsed == [["HH", "AY1"], WHITESPACE, ["DH", "EH1", "R"],
                      "?", "~"]


def test_load_dict_caches(dict_hp):
    d1 = load_pronunciation_dict(dict_hp.mfa_dictionary)
    d2 = load_pronunciation_dict(dict_hp.mfa_dictionary)
    assert d1 is d2
    assert d1["tomato"] == [["T", "AH0", "M", "EY1", "T", "OW2"],
                            ["T", "AH0", "M", "AA1", "T", "OW2"]]
