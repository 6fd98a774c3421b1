"""Deterministic language identification (stand-in for resiliparse lang_detect_fast).

The reference calls ``detect_fast`` (C extension, not available here) at
/root/reference/warc_indexer/indexer/process.py:270.  This module provides a
deterministic stopword+trigram scorer over the fixture language set
{en, de, fr, es, it} plus ``unknown``.  Determinism rules (SURVEY.md §7.3):
fixed vocabularies, fixed tie-break order, no hash iteration order anywhere.

Doubles as the oracle for the fixture ``lang`` column and as the generic
lang-id text-analysis operator over the ``documents`` testdata table.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Tuple

import numpy as np

LANGS: Tuple[str, ...] = ("en", "de", "fr", "es", "it")

# Distinctive high-frequency function words per language.  Words shared by
# several languages appear in each; scoring is additive so distinctive words
# dominate.  Ordered dicts keep iteration deterministic.
_STOPWORDS: Dict[str, Tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with",
           "as", "was", "on", "are", "this", "be", "at", "from", "by", "not"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
           "den", "von", "zu", "für", "auf", "sich", "im", "dem", "des",
           "auch", "werden"),
    "fr": ("le", "la", "les", "et", "est", "dans", "pour", "que", "une",
           "des", "du", "pas", "sur", "avec", "au", "ce", "il", "qui",
           "plus", "ne"),
    "es": ("el", "los", "las", "es", "en", "y", "que", "una", "del", "por",
           "con", "para", "su", "se", "más", "como", "pero", "sus", "al",
           "lo"),
    "it": ("il", "la", "le", "e", "è", "di", "che", "un", "una", "per",
           "con", "non", "sono", "della", "nel", "si", "come", "anche",
           "dei", "alla"),
}

_WORD_RE = re.compile(r"[a-zà-ÿ]+")

# word -> list of language indices claiming it (built once, deterministic).
_CLAIMS: Dict[str, List[int]] = {}
for _li, _lang in enumerate(LANGS):
    for _w in _STOPWORDS[_lang]:
        _CLAIMS.setdefault(_w, []).append(_li)

MIN_TEXT_LEN = 20       # below this, always "unknown"
MIN_SCORE_RATIO = 0.05  # stopword hits / words must reach this


def detect_fast(text: str) -> Tuple[str, int]:
    """Return (lang, score) like resiliparse ``detect_fast``.

    Score is the winning language's stopword hit count; ``unknown`` when the
    text is too short or no language clears the evidence threshold.  Ties go
    to the earlier language in ``LANGS`` (fixed, documented).
    """
    if text is None or len(text) < MIN_TEXT_LEN:
        return "unknown", 0
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "unknown", 0
    scores = [0] * len(LANGS)
    for w in words:
        for li in _CLAIMS.get(w, ()):
            scores[li] += 1
    best = max(range(len(LANGS)), key=lambda i: (scores[i], -i))
    if scores[best] == 0 or scores[best] / len(words) < MIN_SCORE_RATIO:
        return "unknown", scores[best]
    return LANGS[best], scores[best]


def detect_batch(texts: Iterable[str]) -> np.ndarray:
    """Column form for map_batches: language code per text (object array)."""
    return np.array([detect_fast(t if t is not None else "")[0] for t in texts],
                    dtype=object)
