"""ASCII transliteration (dependency-free unidecode replacement).

Folds common Unicode punctuation/letters to ASCII equivalents, then
strips combining marks via NFKD normalization and drops anything still
non-ASCII. Covers the character classes the downstream cleaners handle
(smart quotes, dashes, ellipsis, accented Latin letters).
"""

import unicodedata

_CHAR_MAP = {
    "‘": "'", "’": "'", "‚": "'", "‛": "'",
    "“": '"', "”": '"', "„": '"', "‟": '"',
    "–": "-", "—": "--", "―": "--", "−": "-",
    "…": "...",
    " ": " ", " ": " ", " ": " ", " ": " ",
    " ": " ",
    "«": '"', "»": '"', "‹": "'", "›": "'",
    "ß": "ss", "æ": "ae", "Æ": "AE",
    "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O",
    "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "Th",
    "ı": "i", "ł": "l", "Ł": "L",
    "°": " degrees ", "·": "-",
}


def ascii_fold(text: str) -> str:
    out = []
    for ch in text:
        if ord(ch) < 128:
            out.append(ch)
            continue
        if ch in _CHAR_MAP:
            out.append(_CHAR_MAP[ch])
            continue
        decomposed = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in decomposed
                       if not unicodedata.combining(c) and ord(c) < 128)
        out.append(kept)
    return "".join(out)
