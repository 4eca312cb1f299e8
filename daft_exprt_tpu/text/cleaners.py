"""Text cleaners: normalize in-the-wild text before phonemization.

Pipeline parity with the reference cleaners
(/root/reference/src/daft_exprt/cleaners.py:113-148): ASCII fold ->
lowercase -> number expansion -> abbreviation expansion -> punctuation
canonicalization (everything collapses to the four symbols ``,.!?``).
"""

import re

from daft_exprt_tpu.text.ascii_fold import ascii_fold
from daft_exprt_tpu.text.numbers import normalize_numbers

_whitespace_re = re.compile(r"\s+")

_abbreviations = [
    (re.compile(r"\b%s\." % x[0], re.IGNORECASE), x[1]) for x in [
        ("mrs", "misess"),
        ("mr", "mister"),
        ("dr", "doctor"),
        ("st", "saint"),
        ("co", "company"),
        ("jr", "junior"),
        ("maj", "major"),
        ("gen", "general"),
        ("drs", "doctors"),
        ("rev", "reverend"),
        ("lt", "lieutenant"),
        ("hon", "honorable"),
        ("sgt", "sergeant"),
        ("capt", "captain"),
        ("esq", "esquire"),
        ("ltd", "limited"),
        ("col", "colonel"),
        ("ft", "fort"),
    ]
]


def expand_abbreviations(text):
    for regex, replacement in _abbreviations:
        text = re.sub(regex, replacement, text)
    return text


def expand_numbers(text):
    return normalize_numbers(text)


def lowercase(text):
    return text.lower()


def collapse_whitespace(text):
    return re.sub(_whitespace_re, " ", text)


def convert_to_ascii(text):
    return ascii_fold(text)


def hyphen_remover(text):
    text = re.sub("–", ", ", text)
    text = re.sub(" -- ", ", ", text)
    return re.sub("-", " ", text)


def quote_remover(text):
    return re.sub('"', "", text)


def parenthesis_remover(text):
    return re.sub(r"\(|\)", "", text)


def space_coma_replacer(text):
    return re.sub(r"[\s,]*,+[\s,]*", ", ", text)


def incorrect_starting_character_remover(text):
    while text.startswith((",", " ", ".", "!", "?", "-")):
        text = text[1:]
    return text


def apostrophee_formater(text):
    return re.sub("’", "'", text)


def dot_coma_replacer(text):
    return re.sub(";", ",", text)


def double_dot_replacer(text):
    return re.sub(":", ",", text)


def underscore_replacer(text):
    return re.sub("_", " ", text)


def triple_dot_replacer(text):
    text = re.sub("…", ".", text)
    return re.sub(r"[\s\.]*\.+[\s\.]*", ". ", text)


def multiple_punctuation_fixer(text):
    text = re.sub(r"[\s\.,?!]*\?+[\s\.,?!]*", "? ", text)
    text = re.sub(r"[\s\.,!]*\!+[\s\.,!]*", "! ", text)
    return re.sub(r"[\s\.,]*\.+[\s\.,]*", ". ", text)


def english_cleaners(text):
    """Full English normalization pipeline."""
    text = convert_to_ascii(text)
    text = lowercase(text)

    text = expand_numbers(text)
    text = expand_abbreviations(text)

    text = hyphen_remover(text)
    text = quote_remover(text)
    text = dot_coma_replacer(text)
    text = double_dot_replacer(text)
    text = triple_dot_replacer(text)
    text = apostrophee_formater(text)
    text = parenthesis_remover(text)
    text = space_coma_replacer(text)
    text = underscore_replacer(text)
    text = collapse_whitespace(text)
    text = incorrect_starting_character_remover(text)
    text = multiple_punctuation_fixer(text)
    text = text.strip()

    return text


def text_cleaner(text, lang="english"):
    if lang.lower() == "english":
        text = english_cleaners(text)
    return text
