"""Text → symbol-ID frontend.

Same encoding semantics as the reference (text/__init__.py:22-96): plain text
runs through cleaners; `{ARPABET}` escapes and dictionary hits encode as
phoneme IDs; blanks are interspersed by the caller via :func:`intersperse`.
"""

import re
from typing import List, Optional, Sequence

from facegantts_tpu.text import cleaners as _cleaners_mod
from facegantts_tpu.text.cmudict import CMUDict  # noqa: F401
from facegantts_tpu.text.symbols import BLANK_ID, ID_TO_SYMBOL, SYMBOL_TO_ID, symbols  # noqa: F401

_CURLY_RE = re.compile(r"(.*?)\{(.+?)\}(.*)")
# pad and the legacy eos '~' are never emitted
_DROPPED = {"_", "~"}


def _clean(text: str, cleaner_names: Sequence[str]) -> str:
    for name in cleaner_names:
        fn = _cleaners_mod.CLEANERS.get(name)
        if fn is None:
            raise ValueError(f"Unknown cleaner: {name}")
        text = fn(text)
    return text


def _encode_graphemes(text: str) -> List[int]:
    return [SYMBOL_TO_ID[ch] for ch in text if ch in SYMBOL_TO_ID and ch not in _DROPPED]


def _encode_arpabet(phones: str) -> List[int]:
    return [
        SYMBOL_TO_ID["@" + p] for p in phones.split() if ("@" + p) in SYMBOL_TO_ID
    ]


def text_to_sequence(
    text: str,
    cleaner_names: Sequence[str] = ("english_cleaners",),
    dictionary: Optional[CMUDict] = None,
) -> List[int]:
    """Convert text to a list of symbol IDs.

    `{HH AW1 S}`-style escapes are encoded as phonemes.  With a dictionary,
    each cleaned word is looked up; hits become phonemes, misses stay
    graphemes, words are joined by the space symbol."""
    sequence: List[int] = []
    space = _encode_graphemes(" ")
    while text:
        m = _CURLY_RE.match(text)
        if not m:
            cleaned = _clean(text, cleaner_names)
            if dictionary is not None:
                for word in cleaned.split(" "):
                    pron = dictionary.lookup(word)
                    if pron is not None:
                        sequence += _encode_arpabet(pron[0])
                    else:
                        sequence += _encode_graphemes(word)
                    sequence += space
            else:
                sequence += _encode_graphemes(cleaned)
            break
        sequence += _encode_graphemes(_clean(m.group(1), cleaner_names))
        sequence += _encode_arpabet(m.group(2))
        text = m.group(3)

    if dictionary is not None and sequence and sequence[-1] == space[0]:
        sequence = sequence[:-1]
    return sequence


def sequence_to_text(sequence: Sequence[int]) -> str:
    out = []
    for sid in sequence:
        s = ID_TO_SYMBOL.get(int(sid))
        if s is None:
            continue
        if len(s) > 1 and s[0] == "@":
            s = "{%s}" % s[1:]
        out.append(s)
    return "".join(out).replace("}{", " ")


def intersperse(sequence: Sequence[int], item: int = BLANK_ID) -> List[int]:
    """Insert `item` between/around symbols (reference utils/tts_util.py:17-21)."""
    result = [item] * (len(sequence) * 2 + 1)
    result[1::2] = list(sequence)
    return result
