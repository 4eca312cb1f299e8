"""Number-to-words normalization (dependency-free).

Expands numbers, currency and ordinals in text to their spoken English
form. Replaces the inflect-based normalization of the reference
(/root/reference/src/daft_exprt/normalize_numbers.py) with a native
implementation covering the same regex pipeline and the same year-style
expansion for 1000 < n < 3000.
"""

import re

_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_SCALES = [
    (10 ** 12, "trillion"),
    (10 ** 9, "billion"),
    (10 ** 6, "million"),
    (10 ** 3, "thousand"),
]

_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _two_digits(n: int) -> str:
    if n < 20:
        return _ONES[n]
    tens, units = divmod(n, 10)
    if units == 0:
        return _TENS[tens]
    return f"{_TENS[tens]}-{_ONES[units]}"


def _three_digits(n: int) -> str:
    hundreds, rest = divmod(n, 100)
    if hundreds == 0:
        return _two_digits(rest)
    if rest == 0:
        return f"{_ONES[hundreds]} hundred"
    return f"{_ONES[hundreds]} hundred {_two_digits(rest)}"


def number_to_words(n: int) -> str:
    """Spell out a non-negative integer ('andword'-free style)."""
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 1000:
        return _three_digits(n)
    parts = []
    for scale_value, scale_name in _SCALES:
        if n >= scale_value:
            count, n = divmod(n, scale_value)
            # recurse: the trillion chunk exceeds 999 for n >= 1e15
            # (e.g. 16-digit account numbers) -- _three_digits alone
            # would index past its tables
            parts.append(f"{number_to_words(count)} {scale_name}")
    if n > 0:
        parts.append(_three_digits(n))
    return ", ".join(parts)


def number_to_words_year(n: int) -> str:
    """Year-style expansion: split digits into pairs ('oh' for 0x)."""
    s = str(n)
    if len(s) % 2 == 1:
        s = "0" + s
    parts = []
    for i in range(0, len(s), 2):
        pair = int(s[i:i + 2])
        if pair == 0:
            parts.append("hundred" if parts else "zero")
        elif pair < 10:
            parts.append(f"oh {_ONES[pair]}" if parts else _ONES[pair])
        else:
            parts.append(_two_digits(pair))
    return " ".join(parts)


def ordinal_to_words(n: int) -> str:
    """Spell out an ordinal (21 -> 'twenty-first')."""
    words = number_to_words(n)
    pieces = re.split(r"([ ,-]+)", words)
    last = pieces[-1]
    if last in _ORDINAL_IRREGULAR:
        pieces[-1] = _ORDINAL_IRREGULAR[last]
    elif last.endswith("y"):
        pieces[-1] = last[:-1] + "ieth"
    else:
        pieces[-1] = last + "th"
    return "".join(pieces)


# ----------------------------------------------------------------------
# Regex pipeline (same ordering/semantics as the reference).
_comma_number_re = re.compile(r"([0-9][0-9\,]+[0-9])")
_decimal_number_re = re.compile(r"([0-9]+\.[0-9]+)")
_pounds_re = re.compile(r"£([0-9\,]*[0-9]+)")
_dollars_re = re.compile(r"\$([0-9\.\,]*[0-9]+)")
_ordinal_re = re.compile(r"[0-9]+(st|nd|rd|th)")
_number_re = re.compile(r"[0-9]+")


def _remove_commas(m):
    return m.group(1).replace(",", "")


def _expand_decimal_point(m):
    return m.group(1).replace(".", " point ")


def _expand_dollars(m):
    match = m.group(1)
    parts = match.split(".")
    if len(parts) > 2:
        return match + " dollars"
    # Commas in well-formed amounts ($1,200.50) were already removed by
    # _remove_commas (digit,digit only); malformed leftovers like "$,4"
    # must not crash the cleaner (serving feeds it arbitrary user text).
    parts = [p.replace(",", "") for p in parts]
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    if dollars and cents:
        dollar_unit = "dollar" if dollars == 1 else "dollars"
        cent_unit = "cent" if cents == 1 else "cents"
        return f"{dollars} {dollar_unit}, {cents} {cent_unit}"
    if dollars:
        return f"{dollars} {'dollar' if dollars == 1 else 'dollars'}"
    if cents:
        return f"{cents} {'cent' if cents == 1 else 'cents'}"
    return "zero dollars"


def _expand_ordinal(m):
    return ordinal_to_words(int(re.sub(r"[a-z]", "", m.group(0))))


def _expand_number(m):
    num = int(m.group(0))
    if 1000 < num < 3000:
        if num == 2000:
            return "two thousand"
        if 2000 < num < 2010:
            return "two thousand " + number_to_words(num % 100)
        if num % 100 == 0:
            return number_to_words(num // 100) + " hundred"
        return number_to_words_year(num)
    return number_to_words(num)


def normalize_numbers(text: str) -> str:
    text = re.sub(_comma_number_re, _remove_commas, text)
    text = re.sub(_pounds_re, r"\1 pounds", text)
    text = re.sub(_dollars_re, _expand_dollars, text)
    text = re.sub(_decimal_number_re, _expand_decimal_point, text)
    text = re.sub(_ordinal_re, _expand_ordinal, text)
    text = re.sub(_number_re, _expand_number, text)
    return text
