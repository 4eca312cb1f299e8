"""Dictionary-based phonemization for inference.

Behavioral parity with the reference phonemizer
(/root/reference/src/daft_exprt/generate.py:28-107): clean the text,
split into word/punctuation tokens, look each word up in the MFA
pronunciation dictionary (random choice among variants), insert word
boundaries (whitespace or punctuation) between words, append EOS; OOV
words fall back to the external ``mfa g2p`` CLI when available
(gracefully skipped otherwise -- the sentence is rejected with a clear
error instead of shelling out blindly).
"""

from __future__ import annotations

import collections
import logging
import os
import random
import shutil
import subprocess
import tempfile

from daft_exprt_tpu.data.features import split_sentence_words
from daft_exprt_tpu.symbols import EOS, PUNCTUATION, WHITESPACE
from daft_exprt_tpu.text import text_cleaner

_logger = logging.getLogger(__name__)
_DICT_CACHE: dict = {}


def load_pronunciation_dict(dictionary_path: str) -> dict:
    """MFA dictionary file -> {word: [pronunciation variants]}."""
    if dictionary_path in _DICT_CACHE:
        return _DICT_CACHE[dictionary_path]
    word_trans = collections.defaultdict(list)
    with open(dictionary_path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) >= 2:
                word_trans[parts[0].lower()].append(parts[1:])
    _DICT_CACHE[dictionary_path] = word_trans
    return word_trans


def g2p_oov_words(words: list, g2p_model: str) -> dict:
    """Transcribe OOV words with the external ``mfa g2p`` CLI.

    Returns {word: phones}; empty when the CLI is unavailable.
    """
    if shutil.which("mfa") is None:
        _logger.warning("mfa CLI not available -- cannot phonemize OOV "
                        f"words {words}")
        return {}
    with tempfile.TemporaryDirectory() as tmp:
        oovs = os.path.join(tmp, "oovs.txt")
        with open(oovs, "w", encoding="utf-8") as f:
            f.writelines(f"{w}\n" for w in words)
        trans = os.path.join(tmp, "oovs_trans.txt")
        subprocess.run(["mfa", "g2p", g2p_model, oovs, trans,
                        "-t", os.path.join(tmp, "work")], check=True)
        out = {}
        with open(trans, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) >= 2:
                    out[parts[0]] = parts[1:]
    return out


def phonemize_sentence(sentence: str, hparams, rng=None, log_queue=None):
    """One sentence -> [[phones...], boundary, [phones...], ..., EOS].

    Word entries are lists of phone symbols; boundaries are single
    symbols (whitespace/punctuation); the list always ends with EOS.
    """
    rng = rng or random
    word_trans = load_pronunciation_dict(hparams.mfa_dictionary)

    cleaned = text_cleaner(sentence.strip(), hparams.language).lower().strip()
    tokens, end_punct = split_sentence_words(cleaned, hparams.language)
    if end_punct is not None:
        tokens.append(end_punct)

    phonemized, unk_words = [], []
    while tokens:
        word = tokens.pop(0)
        if word in word_trans:
            phonemized.append(rng.choice(word_trans[word]))
        else:
            unk_words.append(word)
            phonemized.append("<unk>")
        if tokens:
            bound = tokens.pop(0) if tokens[0] in PUNCTUATION \
                else WHITESPACE
            phonemized.append(bound)
    phonemized.append(EOS)

    if unk_words:
        trans = g2p_oov_words(unk_words, hparams.mfa_g2p_model)
        for word in unk_words:
            idx = phonemized.index("<unk>")
            if word in trans:
                phonemized[idx] = trans[word]
            else:
                raise ValueError(
                    f'Cannot phonemize OOV word "{word}" (no dictionary '
                    f"entry and no g2p output)")
    return phonemized


def parse_phonemized_line(text: str):
    """Parse the serialized ``{PHONE PHONE} , {PHONE} ~`` format back
    into the sentence structure (reference generate.py:484-492):
    ``{...}`` groups are word phone lists, bare tokens are boundary /
    EOS symbols."""
    import re
    items = []
    for m in re.finditer(r"\{([^}]*)\}|(\S)", text.strip()):
        if m.group(1) is not None:
            items.append(m.group(1).split())
        else:
            items.append(m.group(2))
    # two consecutive word groups with no explicit boundary symbol get a
    # whitespace boundary (the serialized form writes ' ' ambiguously)
    sentence = []
    for item in items:
        if (sentence and isinstance(sentence[-1], list)
                and isinstance(item, list)):
            sentence.append(WHITESPACE)
        sentence.append(item)
    return sentence


def serialize_phonemized(sentence) -> str:
    """Inverse of parse_phonemized_line."""
    parts = []
    for item in sentence:
        if isinstance(item, list):
            parts.append("{" + " ".join(item) + "}")
        else:
            parts.append(item)
    return " ".join(parts)
