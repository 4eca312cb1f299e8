"""Regenerate tests/golden/cleaner_golden.json.

Pins text_cleaner's behavior over a corpus of nasty strings so the
implementation can be restructured without drifting. Run manually:

    python tests/make_cleaner_golden.py

The corpus mixes real sentences, every abbreviation, currency/number
edge cases, punctuation soup, Unicode, and seeded fuzz strings (the
same pools as tests/test_text_fuzz.py, so the golden file covers the
fuzz surface deterministically).
"""

import json
import os
import random
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

from daft_exprt_tpu.text.cleaners import text_cleaner

HAND_CORPUS = [
    "",
    " ",
    "\t\n",
    "The quick brown fox jumps over the lazy dog.",
    "Dr. Smith paid $1,200.50 on the 3rd of May, 1999!",
    'He said "hello" -- twice (loudly)... really?',
    "Mrs. Jones owns 2,000 acres; No. 7 is hers.",
    "Mr. & Mrs. Dursley, of number four, Privet Drive, were proud.",
    "St. Louis: a city on the Mississippi -- founded 1764.",
    "Col. Mustard, Capt. Peacock, Sgt. Pepper, Lt. Dan, Maj. Tom.",
    "Gen. Lee met Rev. King; Hon. Judge Brown presided.",
    "Drs. Watson and Crick, Esq. Jr. Ltd. Ft. Worth Co.",
    "co. is ambiguous: co.op, co.   op, co.!",
    "mrs.mr.dr.st.",
    "what?!?! no... way,, really;;; yes: ok",
    "…ellipsis… everywhere…",
    "–en dash– and -- em-ish -- and hyphen-ated-words",
    "(parens (nested) here) [brackets stay] {braces stay}",
    "_underscored_text_ and __dunder__",
    "’curly’ and 'straight' apostrophes",
    '"double" “smart” quotes',
    ",leading junk. ?!- and trailing junk,  ",
    "?.!,- only punctuation",
    "a-b–c—d",
    "1 2 3 4.5 6,789 10,000,000",
    "$5 £5 $5.25 $0.99 $1,000,000 $,4 $. £,4",
    "1st 2nd 3rd 4th 11th 12th 13th 21st 103rd",
    "year 1900 1905 1945 2000 2005 2020 2100 3000",
    "pi is 3.14159 and e is 2.71828",
    "9" * 60,
    "1" + "0" * 40,
    "$" + "9" * 30,
    ("123456789" * 8) + "th",
    "MiXeD CaSe TeXt With ACRONYMS like NASA and U.S.A.",
    "café naïve résumé Zürich São Paulo",
    "semicolons; colons: and...dots..everywhere..",
    "tabs\tand\nnewlines\r\nand  double  spaces",
    "word -- -- word",
    "a , , b ,, c , ,, d",
    "a . . b .. c . .. d",
    "a ? ? b ?? c !! d ! ! e",
    ".,?! mixed ?,.! soups !.?,",
    "ends with abbreviation dr.",
    "dr. at the start",
    "i.e. and e.g. are not in the table",
    "ft. ft ft. fort ft.!",
]


def fuzz_pools():
    rng = random.Random(1234)
    return [
        string.printable,
        "".join(chr(c) for c in range(0x20, 0x300)),
        "".join(chr(c) for c in range(0x20, 0x3000, 7)),
        "0123456789$£.,!?-_\"'() \t\n",
        "".join(chr(rng.randrange(0x20, 0x10000)) for _ in range(500)),
    ]


def build_corpus():
    corpus = list(HAND_CORPUS)
    rng = random.Random(99)
    pools = fuzz_pools()
    for i in range(300):
        pool = pools[i % len(pools)]
        corpus.append(
            "".join(rng.choice(pool) for _ in range(rng.randrange(0, 120))))
    return corpus


def main():
    out = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                       "golden", "cleaner_golden.json")
    pairs = [[s, text_cleaner(s)] for s in build_corpus()]
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        # ensure_ascii: fuzz strings may contain lone surrogates, which
        # UTF-8 rejects but \uXXXX escapes round-trip fine
        json.dump(pairs, f, ensure_ascii=True, indent=0)
    print(f"wrote {len(pairs)} pairs to {out}")


if __name__ == "__main__":
    main()
