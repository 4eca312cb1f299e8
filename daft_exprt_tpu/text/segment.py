"""Paragraph -> sentence segmentation for long-input synthesis.

The reference synthesizes line-by-line: its CLI reads a text file of
one sentence per line (/root/reference/scripts/synthesize.py:83-100)
and never confronts a paragraph. A serving endpoint does: a request
longer than ``hparams.max_symbols`` phonemes cannot collate into the
static symbol buckets. This module splits prose into sentences so the
server can batch them into ONE device dispatch and concatenate the
audio (scripts/serve.py handles the batching and the optional
inter-sentence gap).

The splitter is deliberately conservative:

- splits after sentence-final punctuation (``. ! ?``, runs allowed,
  with trailing closing quotes/brackets kept on the left sentence);
- never splits after the cleaners' known abbreviations (``Dr.``,
  ``Mr.``, ...), after single-letter initials (``J. K. Rowling``),
  between digits (``3.14``), or inside ``{...}`` pre-phonemized
  groups (those braces carry ARPAbet, not prose);
- a fragment with no final punctuation is kept as its own sentence.

Splitting happens BEFORE cleaning: each piece then goes through the
usual phonemize path, so per-sentence output is identical to sending
the sentences as separate requests.
"""

from __future__ import annotations

import re

# keep in sync with text/cleaners.py's _abbreviations table (those are
# expanded during cleaning, i.e. AFTER segmentation)
_NO_SPLIT_BEFORE_DOT = {
    "mrs", "mr", "dr", "st", "co", "jr", "maj", "gen", "drs", "rev",
    "lt", "hon", "sgt", "capt", "esq", "ltd", "col", "ft",
}

_END = re.compile(r"""
    ([.!?]+)            # sentence-final punctuation run
    (["'\)\]]*)         # optional closing quotes/brackets
    (\s+|$)             # the whitespace we split on
""", re.VERBOSE)


def split_paragraph(text: str) -> list[str]:
    """Split prose into sentences (see module docstring).

    Returns at least one non-empty piece for non-empty input;
    whitespace around pieces is stripped.
    """
    pieces = []
    start = 0
    depth = 0  # {...} pre-phonemized group nesting
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth = max(depth - 1, 0)
        elif depth == 0 and ch in ".!?":
            m = _END.match(text, i)
            if m and _ok_boundary(text, i, m.end()):
                pieces.append(text[start:m.end(2)].strip())
                start = m.end()
                i = m.end()
                continue
        i += 1
    tail = text[start:].strip()
    if tail:
        pieces.append(tail)
    return [p for p in pieces if p] or ([text.strip()] if text.strip()
                                        else [])


def _ok_boundary(text: str, dot: int, nxt: int) -> bool:
    """True when position ``dot`` (a ``.!?``) really ends a sentence."""
    if text[dot] != ".":
        return True  # ! and ? always end
    # word before the dot
    j = dot
    while j > 0 and (text[j - 1].isalnum() or text[j - 1] == "'"):
        j -= 1
    word = text[j:dot]
    if word.lower() in _NO_SPLIT_BEFORE_DOT:
        return False
    if len(word) == 1 and word.isalpha():
        return False  # initials: "J. K. Rowling"
    if word.isdigit() and nxt < len(text) and text[nxt].isdigit():
        return False  # decimal split across whitespace never happens,
        # but guard "3. 14"-style OCR artifacts anyway
    return True
