"""CMU pronouncing dictionary loader (reference text/cmudict.py:19-34).

The dictionary file itself is an external data asset (the reference ships it
at utils/cmu_dictionary); point ``cmudict_path`` at any standard cmudict-0.7b
formatted file.  Words not found fall back to grapheme encoding in
``text_to_sequence``.
"""

import re
from typing import Dict, List, Optional

from facegantts_tpu.text.symbols import ARPABET

_VALID = frozenset(ARPABET)
_ALT_RE = re.compile(r"\([0-9]+\)")


class CMUDict:
    """word -> list of ARPAbet pronunciations."""

    def __init__(self, file_or_path, keep_ambiguous: bool = True):
        if isinstance(file_or_path, str):
            with open(file_or_path, encoding="latin-1") as f:
                entries = _parse(f)
        else:
            entries = _parse(file_or_path)
        if not keep_ambiguous:
            entries = {w: p for w, p in entries.items() if len(p) == 1}
        self._entries: Dict[str, List[str]] = entries

    def __len__(self) -> int:
        return len(self._entries)

    def lookup(self, word: str) -> Optional[List[str]]:
        return self._entries.get(word.upper())


def _parse(file) -> Dict[str, List[str]]:
    entries: Dict[str, List[str]] = {}
    for line in file:
        if not line or (line[0] < "A" or line[0] > "Z") and line[0] != "'":
            continue
        parts = line.split("  ")
        if len(parts) != 2:
            continue
        word = _ALT_RE.sub("", parts[0])
        pron = _validate(parts[1].strip())
        if pron:
            entries.setdefault(word, []).append(pron)
    return entries


def _validate(pronunciation: str) -> Optional[str]:
    phones = pronunciation.split(" ")
    if any(p not in _VALID for p in phones):
        return None
    return " ".join(phones)
