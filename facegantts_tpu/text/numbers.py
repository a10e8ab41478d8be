"""Number → words normalization, dependency-free.

Covers the behaviors the reference gets from the `inflect` package
(reference text/numbers.py:65-72): comma removal, pounds/dollars, decimals,
ordinals, and cardinal numbers with the Tacotron year-style reading for
1000 < n < 3000.
"""

import re

_UNITS = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_SCALES = [
    (10**12, "trillion"),
    (10**9, "billion"),
    (10**6, "million"),
    (10**3, "thousand"),
    (10**2, "hundred"),
]

_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _two_digits(n: int) -> str:
    if n < 20:
        return _UNITS[n]
    tens, unit = divmod(n, 10)
    return _TENS[tens] + ("-" + _UNITS[unit] if unit else "")


def _three_digits(n: int) -> str:
    hundreds, rest = divmod(n, 100)
    parts = []
    if hundreds:
        parts.append(_UNITS[hundreds] + " hundred")
    if rest:
        parts.append(_two_digits(rest))
    return " ".join(parts)


def number_to_words(n: int) -> str:
    """Cardinal reading of a non-negative integer."""
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 100:
        return _two_digits(n)
    if n < 1000:
        return _three_digits(n)
    words = []
    for scale, name in _SCALES:
        if scale == 100:
            break
        q, n = divmod(n, scale)
        if q:
            words.append(_three_digits(q) + " " + name)
    if n:
        words.append(_three_digits(n))
    return " ".join(words) if words else "zero"


def number_to_words_grouped(n: int) -> str:
    """Read a number in two-digit groups: 1984 -> "nineteen eighty-four".

    Used for year-like numbers (reference behavior via inflect group=2)."""
    hi, lo = divmod(n, 100)
    if lo == 0:
        return _two_digits(hi) + " hundred"
    if lo < 10:
        return _two_digits(hi) + " oh " + _UNITS[lo]
    return _two_digits(hi) + " " + _two_digits(lo)


def ordinal_to_words(n: int) -> str:
    words = number_to_words(n)
    head, _, last = words.rpartition(" ")
    if "-" in last:
        tens, _, unit = last.rpartition("-")
        last = tens + "-" + _ORDINAL_IRREGULAR.get(unit, _suffix_th(unit))
    else:
        last = _ORDINAL_IRREGULAR.get(last, _suffix_th(last))
    return (head + " " + last).strip()


def _suffix_th(word: str) -> str:
    if word.endswith("y"):
        return word[:-1] + "ieth"
    return word + "th"


# ---------------------------------------------------------------------------
# Text-level normalization (reference text/numbers.py:65-72 pipeline order).
# ---------------------------------------------------------------------------

_COMMA_NUM_RE = re.compile(r"([0-9][0-9\,]+[0-9])")
_DECIMAL_RE = re.compile(r"([0-9]+\.[0-9]+)")
_POUNDS_RE = re.compile(r"£([0-9\,]*[0-9]+)")
_DOLLARS_RE = re.compile(r"\$([0-9\.\,]*[0-9]+)")
_ORDINAL_RE = re.compile(r"[0-9]+(st|nd|rd|th)")
_NUMBER_RE = re.compile(r"[0-9]+")


def _expand_dollars_match(m: re.Match) -> str:
    amount = m.group(1)
    parts = amount.split(".")
    if len(parts) > 2:
        return amount + " dollars"
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    if dollars and cents:
        return "%s %s, %s %s" % (
            dollars, "dollar" if dollars == 1 else "dollars",
            cents, "cent" if cents == 1 else "cents")
    if dollars:
        return "%s %s" % (dollars, "dollar" if dollars == 1 else "dollars")
    if cents:
        return "%s %s" % (cents, "cent" if cents == 1 else "cents")
    return "zero dollars"


def _expand_cardinal_match(m: re.Match) -> str:
    num = int(m.group(0))
    if 1000 < num < 3000:
        if num == 2000:
            return "two thousand"
        if 2000 < num < 2010:
            return "two thousand " + number_to_words(num % 100)
        if num % 100 == 0:
            return number_to_words(num // 100) + " hundred"
        return number_to_words_grouped(num)
    return number_to_words(num)


def normalize_numbers(text: str) -> str:
    text = _COMMA_NUM_RE.sub(lambda m: m.group(1).replace(",", ""), text)
    text = _POUNDS_RE.sub(r"\1 pounds", text)
    text = _DOLLARS_RE.sub(_expand_dollars_match, text)
    text = _DECIMAL_RE.sub(lambda m: m.group(1).replace(".", " point "), text)
    text = _ORDINAL_RE.sub(lambda m: ordinal_to_words(int(m.group(0)[:-2])), text)
    text = _NUMBER_RE.sub(_expand_cardinal_match, text)
    return text
