"""Text-analysis operators over the ``documents`` table (build brief:
language-ID, quality scoring, token counting, document fingerprinting).

All kernels are vectorized batch functions (pandas str ops / numpy) meant
for ``map_batches``; stateful pieces (compiled regexes, stopword tables)
live in ``TextScorer`` instances created once per actor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# small per-language stopword lists for the n-gram/stopword language heuristic
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that was for on are with".split()),
    "de": frozenset("der die und das ist nicht ein ich sie mit auf für von zu den".split()),
    "fr": frozenset("le la et les des en un une du est que pour dans ce il".split()),
    "es": frozenset("el la de que y en un una es los del se las por con".split()),
}

_WORD_RE = re.compile(r"[a-zA-ZÀ-ÿ]+")
_PUNCT_RE = re.compile(r"[.,!?]")
_WS_RE = re.compile(r"\s+")


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count; empty/whitespace-only text counts 0.
    Matches ``array_length(regexp_split_to_array(trim(text),'\\s+'))`` with
    an empty-string guard in SQL."""
    stripped = texts.fillna("").str.strip()
    n = stripped.str.count(_WS_RE.pattern) + 1
    return np.where(stripped.str.len() == 0, 0, n).astype(np.int64)


# BPE-ish pre-tokenizer (GPT-2 shaped, but lookahead-free so Python re and
# DuckDB's RE2 agree): contraction suffixes, space-prefixed letter runs,
# digit runs, punctuation runs, whitespace runs
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^\sA-Za-zÀ-ÿ0-9]+|\s+")
BPE_PATTERN_SQL = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^\sA-Za-zÀ-ÿ0-9]+|\s+"


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish token count: non-whitespace matches of the GPT-2-shaped
    pre-tokenizer pattern. The pattern is alternation-only (no lookahead),
    so ``regexp_extract_all`` in DuckDB produces the same matches."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        out[i] = sum(1 for m in _BPE_RE.findall(t) if m.strip())
    return out


def punct_stats(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(n_chars, n_punct) — sentence punctuation [.,!?]."""
    t = texts.fillna("")
    return (
        t.str.len().to_numpy().astype(np.int64),
        t.str.count(_PUNCT_RE.pattern).to_numpy().astype(np.int64),
    )


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Quality-scoring features: length, tokens, mean token length,
    punctuation ratio, uppercase ratio, stopword(en) ratio."""
    t = texts.fillna("")
    n_chars, n_punct = punct_stats(t)
    n_tok = token_count(t)
    n_alpha = t.str.count(r"[A-Za-z]").to_numpy().astype(np.int64)
    n_upper = t.str.count(r"[A-Z]").to_numpy().astype(np.int64)
    mean_tok = np.where(n_tok > 0, (n_chars - np.maximum(n_tok - 1, 0)) / np.maximum(n_tok, 1), 0.0)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tok,
            "mean_token_len": np.round(mean_tok, 6),
            "punct_ratio": np.round(np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0), 6),
            "upper_ratio": np.round(np.where(n_alpha > 0, n_upper / np.maximum(n_alpha, 1), 0.0), 6),
        }
    )


class TextScorer:
    """Actor-pool text stage: language ID + quality + fingerprint, regexes
    compiled once per actor (not per batch)."""

    def __init__(self):
        self.word_re = _WORD_RE
        self.stop = {lang: ws for lang, ws in STOPWORDS.items()}

    def lang_scores(self, text: str) -> str:
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "unknown"
        best_lang, best = "unknown", 0.0
        for lang, ws in self.stop.items():
            score = sum(1 for w in words if w in ws) / len(words)
            if score > best:
                best_lang, best = lang, score
        return best_lang if best > 0.03 else "unknown"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = quality_features(batch["text"])
        out = pd.concat([batch.reset_index(drop=True), feats], axis=1)
        out["lang_pred"] = [self.lang_scores(t) for t in batch["text"].fillna("")]
        out["fingerprint"] = fingerprint64(batch["text"])
        return out


def fingerprint64(texts: pd.Series) -> np.ndarray:
    """Deterministic 64-bit document fingerprint: first 64 bits of md5 of
    the whitespace-normalized lowercased text (stable across engines/runs —
    NOT Python's salted hash — and md5-anchored so the DuckDB oracle can
    recompute it)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        norm = _WS_RE.sub(" ", t.strip().lower())
        h = int(hashlib.md5(norm.encode()).hexdigest()[:16], 16)
        out[i] = h - (1 << 64) if h >= 1 << 63 else h
    return out


def md5_hex(texts: pd.Series) -> list[str]:
    """md5 of the raw text — matches DuckDB's ``md5(text)`` exactly (the
    exact-dedup key)."""
    return [hashlib.md5(t.encode()).hexdigest() for t in texts.fillna("")]
