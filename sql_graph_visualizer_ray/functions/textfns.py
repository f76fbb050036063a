"""Text-analysis stages for training-data pipelines over the ``documents``
table: token counting, quality scoring, language ID, fingerprinting.

All are callable CLASSES with setup (regex compile, stopword tables) in
``__init__`` and vectorized pandas/numpy work in ``__call__``. (The
reference's analogue of "stateful setup once" is its prepared-statement
cache, ``/root/reference/internal/application/services/performance/performance_schema_adapter.go:402-425``.)

How they run: pipelines wrap them with ``as_tasks`` — stateless
``map_batches`` tasks holding ONE cached instance per worker process. That
keeps the setup-once amortization of an actor pool with none of the pool's
startup latency, which measurably dominated these stages (setup here is
microseconds of regex compile). Stages with genuinely heavy state (model
weights, e.g. ``multimodal.FeatureExtractor``) stay actor pools.
"""

from __future__ import annotations

import functools
import re

import numpy as np
import pandas as pd


@functools.lru_cache(maxsize=None)
def _instance(cls):
    return cls()


def as_tasks(cls):
    """Wrap a stage class as a stateless task function with a per-process
    cached instance (see module docstring for when this beats an actor
    pool)."""

    def fn(batch):
        return _instance(cls)(batch)

    fn.__name__ = cls.__name__  # keep the stage name in ds.stats()
    return fn

#: ASCII-explicit token regex, chosen so the DuckDB oracle
#: (``regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r]')``) has
#: identical semantics — Python's unicode \w would diverge from RE2's.
TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r]"

PUNCT_PATTERN = r"[.!?,;:]"

#: tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "ich", "mit", "zu"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "un", "una", "es", "por"},
}


class TokenCounter:
    """(doc_id, n_tokens) with a BPE-ish word/punct regex."""

    def __init__(self):
        self.pat = re.compile(TOKEN_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["text"]
                .fillna("")
                .str.findall(self.pat)
                .str.len()
                .astype("int64"),
            }
        )


class QualityScorer:
    """Integer quality signals: char count, word count, punctuation count,
    uppercase-char count. Integers only so the DuckDB oracle matches
    bit-for-bit (no float-rounding hazards)."""

    def __init__(self):
        self.punct = re.compile(PUNCT_PATTERN)
        self.word = re.compile(r"[^ \t\n\r]+")
        self.upper = re.compile(r"[A-Z]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": text.str.len().astype("int64"),
                "n_words": text.str.findall(self.word).str.len().astype("int64"),
                "n_punct": text.str.findall(self.punct).str.len().astype("int64"),
                "n_upper": text.str.findall(self.upper).str.len().astype("int64"),
            }
        )


class LanguageId:
    """Stopword-hit language heuristic: language with the most stopword hits
    wins; ties and zero-hit rows -> 'und' (undetermined)."""

    def __init__(self):
        self.pats = {
            lang: re.compile(
                r"\b(" + "|".join(sorted(words)) + r")\b", re.IGNORECASE
            )
            for lang, words in LANG_STOPWORDS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        langs = sorted(self.pats)
        scores = np.stack(
            [text.str.count(self.pats[lang]).to_numpy() for lang in langs], axis=1
        )
        best = scores.argmax(axis=1)
        best_score = scores.max(axis=1)
        # tie or zero -> undetermined
        second = np.sort(scores, axis=1)[:, -2] if len(langs) > 1 else 0
        pred = np.array(langs, dtype=object)[best]
        pred[(best_score == 0) | (best_score == second)] = "und"
        return pd.DataFrame({"doc_id": batch["doc_id"], "pred_lang": pred})


class Fingerprinter:
    """64-bit rolling-hash document fingerprint (polynomial hash of the token
    stream) — content-identity key for exact dedup at scale."""

    def __init__(self, base: int = 1000003, mod: int = (1 << 61) - 1):
        self.pat = re.compile(TOKEN_PATTERN)
        self.base = base
        self.mod = mod

    def _fp(self, toks: list[str]) -> int:
        h = 0
        for t in toks:
            h = (h * self.base + hash_token(t)) % self.mod
        return h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.findall(self.pat)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": toks.map(self._fp).astype("int64"),
            }
        )


def hash_token(tok: str) -> int:
    """Deterministic (non-salted) token hash."""
    import zlib

    return zlib.crc32(tok.encode("utf-8", "ignore"))


WORD_LOWER_PATTERN = r"[a-z0-9_]+"


class TermExploder:
    """(doc_id, term, n) term frequencies per document — one exploded
    C-level groupby per batch, no per-document Python."""

    def __init__(self):
        self.pat = re.compile(WORD_LOWER_PATTERN)

    def explode(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.lower().str.findall(self.pat)
        lens = toks.str.len().to_numpy()
        flat = pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), lens),
                "term": np.concatenate(
                    [np.array(t, dtype=object) for t in toks if t]
                )
                if lens.sum()
                else np.array([], dtype=object),
            }
        )
        return flat.groupby(["doc_id", "term"], sort=False, as_index=False).agg(
            n=("term", "size")
        )
