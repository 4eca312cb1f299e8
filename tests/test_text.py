"""Text frontend tests: cleaners, number normalization, ASCII fold."""

from daft_exprt_tpu.text.ascii_fold import ascii_fold
from daft_exprt_tpu.text.cleaners import normalize_english, text_cleaner
from daft_exprt_tpu.text.numbers import (normalize_numbers, number_to_words,
                                         number_to_words_year,
                                         ordinal_to_words)


def test_number_to_words_basic():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(15) == "fifteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(101) == "one hundred one"
    assert number_to_words(999) == "nine hundred ninety-nine"
    assert number_to_words(1000) == "one thousand"
    assert number_to_words(1234567) == \
        "one million, two hundred thirty-four thousand, five hundred " \
        "sixty-seven"


def test_number_to_words_year():
    assert number_to_words_year(1945) == "nineteen forty-five"
    assert number_to_words_year(1905) == "nineteen oh five"
    assert number_to_words_year(1900) == "nineteen hundred"


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(2) == "second"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(4) == "fourth"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty-first"
    assert ordinal_to_words(100) == "one hundredth"


def test_normalize_numbers():
    assert normalize_numbers("I have 3 cats") == "I have three cats"
    assert normalize_numbers("born in 1984") == "born in nineteen eighty-four"
    assert normalize_numbers("it costs $5.25 total") == \
        "it costs five dollars, twenty-five cents total"
    assert normalize_numbers("the 2nd time") == "the second time"
    # 1000 < n < 3000 uses year-style expansion (keithito behavior)
    assert normalize_numbers("1,234 items") == "twelve thirty-four items"
    assert normalize_numbers("4,321 items") == \
        "four thousand, three hundred twenty-one items"
    assert normalize_numbers("pi is 3.14") == "pi is three point fourteen"
    assert normalize_numbers("year 2000") == "year two thousand"
    assert normalize_numbers("year 2005") == "year two thousand five"
    assert normalize_numbers("year 2100") == "year twenty-one hundred"


def test_ascii_fold():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("naïve") == "naive"
    assert ascii_fold("“quoted”") == '"quoted"'
    assert ascii_fold("it’s") == "it's"
    assert ascii_fold("a – b") == "a - b"
    assert ascii_fold("wait…") == "wait..."


def test_normalize_english():
    # Punctuation collapses to the four canonical symbols ,.!?
    out = normalize_english("Hello; world: this -- is a test...")
    assert out == "hello, world, this, is a test."
    out = normalize_english('Dr. Smith said "yes" (quietly)!')
    assert out == "doctor smith said yes quietly!"
    out = normalize_english("What?!  Really??")
    assert out == "what? really?"
    out = normalize_english("Mr. O’Neil has 2 dogs")
    assert out == "mister o'neil has two dogs"
    # leading punctuation is stripped
    assert normalize_english(", hello") == "hello"


def test_text_cleaner_language_gate():
    assert text_cleaner("Hello World", "english") == "hello world"
    # unknown languages pass through
    assert text_cleaner("Bonjour", "french") == "Bonjour"


def test_huge_numbers_do_not_crash():
    """16-digit digit runs (card/account numbers) must normalize, not
    IndexError (round-2 review: scale chunks above 999 overflowed the
    ones table)."""
    from daft_exprt_tpu.text.numbers import (normalize_numbers,
                                             number_to_words)

    out = normalize_numbers("card 5105105105105100 ok")
    assert "5105105105105100" not in out and "trillion" in out
    assert number_to_words(5105 * 10 ** 12) \
        == "five thousand, one hundred five trillion"
    assert number_to_words(10 ** 18) == "one million trillion"
