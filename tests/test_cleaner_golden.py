"""Golden pin on text_cleaner over 346 nasty strings.

The corpus (tests/golden/cleaner_golden.json, regenerate with
tests/make_cleaner_golden.py) covers real sentences, every
abbreviation, currency/number edges, punctuation soup, Unicode, and
seeded fuzz — so the cleaner implementation can be restructured freely
while the normalization behavior stays bit-identical (the phonemizer,
MFA corpus prep, and serving all sit on top of it).
"""

import json
import os

import pytest

from daft_exprt_tpu.text.cleaners import text_cleaner

_GOLDEN = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                       "golden", "cleaner_golden.json")


@pytest.mark.fast
def test_cleaner_matches_golden_corpus():
    with open(_GOLDEN) as f:
        pairs = json.load(f)
    assert len(pairs) >= 300
    mismatches = [(s, expect, text_cleaner(s))
                  for s, expect in pairs if text_cleaner(s) != expect]
    assert not mismatches, mismatches[:5]
