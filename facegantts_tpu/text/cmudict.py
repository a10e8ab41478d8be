"""CMU pronouncing dictionary loader (reference text/cmudict.py:19-34).

The framework bundles the standard cmudict-0.7b asset (public-domain data
from the CMU Sphinx project, the same 133,951-line file the reference ships
at utils/cmu_dictionary and loads at text/cmudict.py:19-34) gzipped under
``facegantts_tpu/assets/``, so phoneme token IDs match reference-trained
checkpoints out of the box.  ``cmudict_path`` may still point at any
standard cmudict-formatted file (plain or .gz); words not found fall back
to grapheme encoding in ``text_to_sequence``.
"""

import gzip
import os
import re
from typing import Dict, List, Optional

from facegantts_tpu.text.symbols import ARPABET

_VALID = frozenset(ARPABET)
_ALT_RE = re.compile(r"\([0-9]+\)")

BUNDLED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "cmudict-0.7b.txt.gz",
)


class CMUDict:
    """word -> list of ARPAbet pronunciations."""

    def __init__(self, file_or_path, keep_ambiguous: bool = True):
        if isinstance(file_or_path, str):
            opener = gzip.open if file_or_path.endswith(".gz") else open
            with opener(file_or_path, "rt", encoding="latin-1") as f:
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


_DEFAULT: Optional[CMUDict] = None


def default_cmudict(path: Optional[str] = None) -> CMUDict:
    """The dictionary inference/data paths should use: ``path`` if it exists,
    else the bundled cmudict-0.7b asset.  Cached (the parse takes ~0.5 s)."""
    global _DEFAULT
    if path and os.path.exists(path):
        return CMUDict(path)
    if _DEFAULT is None:
        _DEFAULT = CMUDict(BUNDLED_PATH)
    return _DEFAULT


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
