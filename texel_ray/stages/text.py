"""Text-analysis stages for training-data pipelines (documents table).

Vectorized per-batch kernels (pandas string ops / compiled regexes held by
an actor): token counting, quality scoring (length/alpha/stopword ratios),
n-gram language ID, and rolling-hash document fingerprinting.

The feature kernel's arithmetic is mirrored 1:1 by ANSI SQL in
``pipelines/queries.py`` so the DuckDB oracle reproduces the exact doubles
(same operation order; integer counts wherever a sum crosses rows).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

STOPWORDS_RE = r"\b(the|a|of|and|to|in|is)\b"
_ALPHA_RE = r"[^a-zA-Z]"

# language stopword profiles for the n-gram/stopword heuristic language ID
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "for", "on", "with"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
    "zh": set(),  # CJK detected by codepoint range, not stopwords
}


class TextFeatures:
    """Actor-pool stage: compiled regexes once per actor, vectorized batches.

    Output columns (exact-parity with the SQL oracle):
    n_chars, n_tokens, alpha_chars, stop_hits, quality_score.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.stop_re = re.compile(STOPWORDS_RE)
        self.alpha_re = re.compile(_ALPHA_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col].to_pandas().fillna("").astype(str)
        n_chars = text.str.len().to_numpy(dtype=np.int64)
        stripped = text.str.strip()
        n_tokens = np.where(
            stripped.str.len() == 0, 0, stripped.str.split().str.len()
        ).astype(np.int64)
        alpha_chars = (
            text.str.replace(self.alpha_re, "", regex=True).str.len().to_numpy(np.int64)
        )
        stop_hits = (
            text.str.lower().str.count(self.stop_re).to_numpy(np.int64)
        )
        # quality score: fixed operation order, mirrored in SQL
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha_ratio = np.where(n_chars > 0, alpha_chars / n_chars, 0.0)
            stop_ratio = np.where(n_tokens > 0, stop_hits / n_tokens, 0.0)
        len_norm = np.minimum(n_tokens, 100).astype(np.float64) / 100.0
        quality = 0.5 * alpha_ratio + 0.3 * stop_ratio + 0.2 * len_norm
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_chars": pa.array(n_chars),
                "n_tokens": pa.array(n_tokens),
                "alpha_chars": pa.array(alpha_chars),
                "stop_hits": pa.array(stop_hits),
                "quality_score": pa.array(quality),
            }
        )


_FP_MOD = (1 << 61) - 1
_FP_BASE = 257


def fingerprint64(s: str) -> int:
    """Polynomial rolling hash of the utf-8 bytes, mod 2^61-1."""
    h = 0
    for b in s.encode("utf-8"):
        h = (h * _FP_BASE + b) % _FP_MOD
    return h


_M61 = np.uint64(_FP_MOD)


def _mul257_mod61(h: np.ndarray) -> np.ndarray:
    """Vectorized h*257 mod 2^61-1 for h < 2^61 + small slack, exact.

    Splits h at bit 33 so every partial product fits uint64, and folds the
    2^33 shift with the Mersenne identity 2^61 ≡ 1 (mod 2^61-1)."""
    h_hi = h >> np.uint64(33)  # < 2^28 (+ slack)
    h_lo = h & np.uint64((1 << 33) - 1)
    t = h_hi * np.uint64(257)  # < 2^37
    folded = ((t & np.uint64((1 << 28) - 1)) << np.uint64(33)) + (
        t >> np.uint64(28)
    )  # == t * 2^33 mod p, < 2^61 + 2^9
    res = folded + h_lo * np.uint64(257)  # < 2^62
    res = (res & _M61) + (res >> np.uint64(61))
    return res  # < 2^61 + 1 (reduced enough for the next round's split)


def fingerprint64_batch(texts: list) -> np.ndarray:
    """Vectorized fingerprint64 across documents, bit-identical.

    Documents are right-aligned into one (n_docs, max_len) byte matrix —
    base-257 leading zero bytes don't change the polynomial value — and
    the Horner recurrence runs max_len vectorized rounds over the whole
    batch (Mersenne-61 folding keeps every intermediate inside uint64)."""
    n = len(texts)
    bufs = [(t or "").encode("utf-8") for t in texts]
    max_len = max((len(b) for b in bufs), default=0)
    if max_len == 0:
        return np.zeros(n, dtype=np.int64)
    mat = np.zeros((n, max_len), dtype=np.uint64)
    for i, b in enumerate(bufs):
        if b:
            mat[i, max_len - len(b):] = np.frombuffer(b, dtype=np.uint8)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(max_len):
        h = _mul257_mod61(h) + mat[:, j]  # < 2^61 + 2^9, split-safe
    h = (h & _M61) + (h >> np.uint64(61))
    h = np.where(h >= _M61, h - _M61, h)
    return h.astype(np.int64)


class Fingerprinter:
    """Rolling-hash document fingerprint (dedup pre-key / lineage id)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = fingerprint64_batch(batch[self.text_col].to_pylist())
        return pa.table({self.id_col: batch[self.id_col], "fingerprint": pa.array(fps)})


class LangId:
    """Stopword-profile + codepoint-range language identification."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.cjk_re = re.compile(r"[一-鿿]")

    def _predict(self, text: str) -> tuple[str, float]:
        if self.cjk_re.search(text):
            return "zh", 1.0
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und", 0.0
        best_lang, best = "und", 0
        for lang, profile in _LANG_PROFILES.items():
            if not profile:
                continue
            hits = sum(1 for w in words if w in profile)
            if hits > best:
                best_lang, best = lang, hits
        return best_lang, best / len(words)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized batch kernel: pandas str ops + one explode/isin pass
        per language profile; identical to ``_predict`` per row."""
        s = pd.Series(batch[self.text_col].to_pylist()).fillna("")
        n = len(s)
        cjk = s.str.contains(self.cjk_re).to_numpy()
        words = s.str.findall(self.word_re)
        nw = words.str.len().to_numpy(dtype=np.int64)
        exploded = words.explode().str.lower()
        langs = [lang for lang, prof in _LANG_PROFILES.items() if prof]
        hits = np.zeros((n, len(langs)), dtype=np.int64)
        valid = exploded.notna()
        ev = exploded[valid]
        for li, lang in enumerate(langs):
            h = ev.isin(_LANG_PROFILES[lang]).groupby(level=0).sum()
            hits[h.index.to_numpy(), li] = h.to_numpy()
        best = hits.max(axis=1)
        # argmax returns the FIRST maximal column — the same tie-break as
        # the scalar loop's strict-> update over dict order (en,de,fr,es)
        best_li = hits.argmax(axis=1)
        lang_arr = np.array(langs)[best_li]
        preds = np.where(best > 0, lang_arr, "und")
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(nw > 0, best / np.maximum(nw, 1), 0.0)
        preds = np.where(nw == 0, "und", preds)
        preds = np.where(cjk, "zh", preds)
        scores = np.where(cjk, 1.0, scores)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "lang_pred": pa.array(preds.tolist(), pa.string()),
                "lang_score": pa.array(scores, pa.float64()),
            }
        )


def token_histogram(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-batch partial token counts (word -> n), pre-aggregation for a
    vocabulary groupby."""
    tokens = batch[text_col].astype(str).str.split().explode()
    counts = tokens.value_counts()
    return pd.DataFrame({"token": counts.index, "n_partial": counts.to_numpy()})


def tfidf_partial(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-batch TF-IDF partials: (token, tf_partial, df_partial). A doc
    never spans batches (one row = one doc), so document frequencies sum
    correctly across partials."""
    toks = batch[text_col].astype(str).str.split().explode().dropna()
    tf = toks.value_counts()
    df = toks.reset_index().drop_duplicates()[text_col].value_counts()
    return pd.DataFrame(
        {
            "token": tf.index,
            "tf_partial": tf.to_numpy(),
            "df_partial": df.reindex(tf.index).to_numpy(),
        }
    )
