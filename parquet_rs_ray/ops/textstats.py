"""Text analysis operators (vectorized map_batches stages):

* token_count     — whitespace tokens + a BPE-ish word/punct regex count
* quality_score   — length / punctuation / stopword-ratio heuristics
* language_id     — character n-gram profile heuristic
* fingerprint     — rolling-hash document fingerprint (64-bit)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BPE_RE = re.compile(r"\w+|[^\w\s]")

_STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "a", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "une", "du"},
    "es": {"el", "la", "de", "y", "los", "en", "un", "una", "que", "del"},
}


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """whitespace-token and regex-token counts per document.

    The whitespace count is defined as count(' ') + 1 so a SQL oracle can
    reproduce it exactly (LENGTH(x) - LENGTH(REPLACE(x,' ','')) + 1)."""
    txt = batch.column(text_col)
    n_ws = pc.add(pc.count_substring(txt, " "), 1)
    texts = txt.to_pylist()
    n_bpe = pa.array([len(_BPE_RE.findall(t)) for t in texts], pa.int64())
    out = pa.table({
        "n_tokens_ws": n_ws.combine_chunks() if isinstance(n_ws, pa.ChunkedArray) else n_ws,
        "n_tokens_re": n_bpe,
    })
    for name in batch.column_names:
        if name != text_col:
            out = out.append_column(name, batch.column(name))
    return out


class QualityScorer:
    """Stateful scorer: compiled regexes + stopword tables per actor."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.punct_re = re.compile(r"[^\w\s]")
        self.all_stop = set().union(*_STOPWORDS.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        length = np.array([len(t) for t in texts], dtype=np.float64)
        words = [t.split() for t in texts]
        n_words = np.array([len(w) for w in words], dtype=np.float64)
        mean_wl = np.array([np.mean([len(x) for x in w]) if w else 0.0
                            for w in words])
        punct = np.array([len(self.punct_re.findall(t)) for t in texts],
                         dtype=np.float64)
        stop_ratio = np.array(
            [sum(1 for x in w if x.lower() in self.all_stop) / len(w) if w else 0.0
             for w in words])
        # heuristic quality in [0,1]: plausible word lengths, some
        # stopwords, not punctuation-dominated, not too short
        score = (np.clip(n_words / 50.0, 0, 1) * 0.3
                 + np.clip(1 - np.abs(mean_wl - 5.0) / 5.0, 0, 1) * 0.3
                 + np.clip(stop_ratio * 4, 0, 1) * 0.2
                 + np.clip(1 - punct / np.maximum(length, 1) * 5, 0, 1) * 0.2)
        out = pa.table({"quality_score": pa.array(np.round(score, 6))})
        for name in batch.column_names:
            if name != self.text_col:
                out = out.append_column(name, batch.column(name))
        return out


class LanguageId:
    """Character n-gram profile language guesser (tiny, deterministic).
    Profiles are built once per actor from stopword seeds — a stand-in for
    a real fasttext model (not in this container); the Ray-side plumbing
    (stateful actor stage, batch scoring) is the real thing."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {lang: set(w for w in ws)
                         for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        langs = []
        for t in texts:
            words = set(w.lower() for w in t.split()[:200])
            best, best_n = "unknown", 0
            for lang, prof in self.profiles.items():
                hits = len(words & prof)
                if hits > best_n:
                    best, best_n = lang, hits
            langs.append(best)
        out = pa.table({"lang_pred": pa.array(langs, pa.string())})
        for name in batch.column_names:
            if name != self.text_col:
                out = out.append_column(name, batch.column(name))
        return out


def fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling-hash fingerprint per document (content-defined)."""
    from .dedup import _hash_strings
    h = _hash_strings(batch.column(text_col))
    out = pa.table({"fingerprint": pa.array(h.astype(np.int64))})
    for name in batch.column_names:
        if name != text_col:
            out = out.append_column(name, batch.column(name))
    return out
