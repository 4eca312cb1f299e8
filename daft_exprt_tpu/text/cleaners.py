"""Text normalization frontend: raw text -> phonemizer-ready English.

Everything the phonemizer sees flows through :func:`text_cleaner`:
fold to ASCII, lowercase, spell out numbers, spell out titles, and
collapse all punctuation into the four marks the symbol inventory
keeps (`,.!?`) with canonical single spacing.

Provenance note: the normalization *semantics* — the 18-entry title
table, which marks survive, and the rewrite ordering — are
parity-locked to the reference frontend
(/root/reference/src/daft_exprt/cleaners.py:113-141, itself derived
from keithito/tacotron, MIT) and pinned bit-for-bit by
tests/golden/cleaner_golden.json over a 346-string corpus. The
implementation is original: a single table-driven rewrite engine
instead of one function per regex.
"""

import re

from daft_exprt_tpu.text.ascii_fold import ascii_fold
from daft_exprt_tpu.text.numbers import normalize_numbers

# Spoken-title expansions, applied as SEQUENTIAL passes in table
# order (not one alternation pass): each expansion can glue onto the
# following token and erase the word boundary a later title would have
# needed ("mrs.mr." -> "misessmr." leaves "mr." unexpanded), and the
# golden corpus pins exactly that sequential behavior.
_TITLES = {
    "mrs": "misess", "mr": "mister", "dr": "doctor", "st": "saint",
    "co": "company", "jr": "junior", "maj": "major", "gen": "general",
    "drs": "doctors", "rev": "reverend", "lt": "lieutenant",
    "hon": "honorable", "sgt": "sergeant", "capt": "captain",
    "esq": "esquire", "ltd": "limited", "col": "colonel", "ft": "fort",
}
_TITLE_PASSES = [(re.compile(r"\b%s\." % t, re.IGNORECASE), spoken)
                 for t, spoken in _TITLES.items()]

# Ordered rewrite program. Order is load-bearing and golden-pinned:
# e.g. dashes become ", " before the comma-squash pass normalizes the
# spacing around them, and sentence-dot squashing runs both before
# comma handling (so ".," soup resolves dots-first) and again at the
# very end over the leading-stripped text. The Unicode rows (en dash,
# ellipsis, curly quote) are unreachable after ascii_fold but kept so
# each pass is safe standalone.
_REWRITES = [
    ("–", ", "),
    (" -- ", ", "),
    ("-", " "),
    ('"', ""),
    (";", ","),
    (":", ","),
    ("…", "."),
    (r"[\s.]*\.+[\s.]*", ". "),
    ("’", "'"),
    (r"[()]", ""),
    (r"[\s,]*,+[\s,]*", ", "),
    ("_", " "),
    (r"\s+", " "),
]
# Final squash after leading-junk strip: each terminator absorbs any
# adjacent run of weaker marks and whitespace ("?" > "!" > ".").
_TERMINATOR_SQUASH = [
    (r"[\s.,?!]*\?+[\s.,?!]*", "? "),
    (r"[\s.,!]*!+[\s.,!]*", "! "),
    (r"[\s.,]*\.+[\s.,]*", ". "),
]

_REWRITES = [(re.compile(p), r) for p, r in _REWRITES]
_TERMINATOR_SQUASH = [(re.compile(p), r) for p, r in _TERMINATOR_SQUASH]

# Characters that may never start a cleaned sentence.
_LEADING_JUNK = " ,.!?-"


def _spell_out_titles(text):
    return _run_rewrites(text, _TITLE_PASSES)


def _run_rewrites(text, program):
    for pattern, replacement in program:
        text = pattern.sub(replacement, text)
    return text


def normalize_english(text):
    """Full English normalization: any string -> `[a-z' ,.!?]`-ish."""
    text = ascii_fold(text).lower()
    text = normalize_numbers(text)
    text = _spell_out_titles(text)
    text = _run_rewrites(text, _REWRITES)
    text = text.lstrip(_LEADING_JUNK)
    text = _run_rewrites(text, _TERMINATOR_SQUASH)
    return text.strip()


def text_cleaner(text, lang="english"):
    if lang.lower() == "english":
        text = normalize_english(text)
    return text
