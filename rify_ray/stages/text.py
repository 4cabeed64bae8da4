"""Text-analysis stages over the ``documents`` table: token counting,
character stats, language ID, quality features, document fingerprints.

All per-batch functions are Arrow compute kernels (vectorized); the md5
fingerprint uses hashlib per row (C-level digest, no Python parsing).
Each op has an exact ANSI-SQL twin in ``__ray_entry__.oracle_sql`` — the
semantics here are deliberately SQL-expressible so the DuckDB oracle can
verify them value-for-value.
"""

from __future__ import annotations

import hashlib

import numpy as np
from typing import Dict, List, Tuple

import pyarrow as pa
import pyarrow.compute as pc

# language-ID stopword lists: counts of these substrings decide the
# language (argmax, ties broken in list order).  Substring counting is
# non-overlapping left-to-right in BOTH Arrow (count_substring) and the
# SQL replace-based twin, so the two sides agree exactly.
LANG_MARKERS: List[Tuple[str, List[str]]] = [
    ("en", [" the ", " and ", " of "]),
    ("de", [" der ", " und ", " die "]),
    ("fr", [" le ", " la ", " et "]),
]


def token_count_fn(batch: pa.Table) -> pa.Table:
    """n_tokens = number of maximal non-whitespace runs."""
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(
                pc.count_substring_regex(batch["text"], r"\S+"), pa.int64()
            ),
        }
    )


def char_stats_fn(batch: pa.Table) -> pa.Table:
    """Integer quality features: total/alpha/digit/space char counts."""
    text = batch["text"]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_alpha": pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64()),
            "n_digit": pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64()),
            "n_space": pc.cast(pc.count_substring(text, " "), pa.int64()),
        }
    )


def lang_id_fn(batch: pa.Table) -> pa.Table:
    """N-gram(ish) heuristic language ID: argmax of stopword-marker
    counts, first language in LANG_MARKERS wins ties."""
    text = batch["text"]
    scores = []
    for _, markers in LANG_MARKERS:
        s = None
        for mk in markers:
            c = pc.count_substring(text, mk)
            s = c if s is None else pc.add(s, c)
        scores.append(s)
    # argmax with first-wins ties: pred = en if en>=de and en>=fr else ...
    pred = None
    n = batch.num_rows
    lang_names = [name for name, _ in LANG_MARKERS]
    # build from the last upwards: default = last language
    pred = pa.array([lang_names[-1]] * n, pa.string())
    for i in range(len(lang_names) - 2, -1, -1):
        ge_all = None
        for j in range(i + 1, len(lang_names)):
            ge = pc.greater_equal(scores[i], scores[j])
            ge_all = ge if ge_all is None else pc.and_(ge_all, ge)
        pred = pc.if_else(ge_all, pa.array([lang_names[i]] * n, pa.string()), pred)
    return pa.table({"doc_id": batch["doc_id"], "lang_pred": pred})


# stopword list for the quality score (English function words — a tiny,
# fixed list so the SQL twin can enumerate it)
QUALITY_STOPWORDS: List[str] = [" the ", " and ", " of ", " to ", " in ", " a "]


def quality_score_fn(batch: pa.Table) -> pa.Table:
    """Heuristic document-quality features in integer basis points
    (wilson-free, SQL-twin-exact): stopword density, punctuation density
    and mean token length — the classic cheap web-text quality signals.

    - ``stopword_bp``  = 10000 * stopword occurrences / tokens
    - ``punct_bp``     = 10000 * [.,;:!?] chars / total chars
    - ``token_len_c``  = 100 * non-space chars / tokens

    Integer outputs (floor division) so the DuckDB oracle matches
    value-for-value with no float-hash instability."""
    text = batch["text"]
    tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    tokens_nz = pc.max_element_wise(tokens, pa.scalar(1, pa.int64()))
    sw = None
    for w in QUALITY_STOPWORDS:
        c = pc.count_substring(text, w)
        sw = c if sw is None else pc.add(sw, c)
    sw = pc.cast(sw, pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    chars_nz = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    punct = pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.int64())
    nonspace = pc.subtract(n_chars, pc.cast(pc.count_substring(text, " "), pa.int64()))
    ten_k = pa.scalar(10_000, pa.int64())
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "stopword_bp": pc.divide(pc.multiply(sw, ten_k), tokens_nz),
            "punct_bp": pc.divide(pc.multiply(punct, ten_k), chars_nz),
            "token_len_c": pc.divide(
                pc.multiply(nonspace, pa.scalar(100, pa.int64())), tokens_nz
            ),
        }
    )


def fingerprint_fn(batch: pa.Table) -> pa.Table:
    """Document fingerprint = md5 hex digest of the text bytes (exactly
    DuckDB's ``md5(text)``)."""
    fps = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
        for t in batch["text"].to_pylist()
    ]
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.string())})


def normalize_fn(batch: pa.Table) -> pa.Table:
    """Canonical text normalization for dedup keys / tokenizer input:
    lowercase + collapse whitespace runs to one space + strip.  Pure
    Arrow kernels; exactly
    ``trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))`` in SQL."""
    t = pc.utf8_trim_whitespace(
        pc.utf8_lower(pc.replace_substring_regex(batch["text"], r"\s+", " "))
    )
    return pa.table({"doc_id": batch["doc_id"], "norm": t})


def text_stage(docs_ds, fn, *, batch_size: int = 4096):
    """Apply one of the text fns as a streaming stateless stage."""
    return docs_ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


# GPT-2-style pre-tokenizer regex, RE2-compatible (no lookahead):
# contractions, space-prefixed letter/digit runs, punctuation runs,
# whitespace runs.  Arrow and DuckDB both run RE2, so
# ``length(regexp_extract_all(text, RX))`` is the exact SQL twin.
BPE_PRETOKEN_RX = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_fn(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → BPE-ish pre-token count: the sequence-length
    estimator a training-data pipeline uses when whitespace counts are
    too coarse (a BPE tokenizer splits exactly at these boundaries
    before merges).  One vectorized RE2 kernel per batch."""
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(batch["text"], BPE_PRETOKEN_RX), pa.int64()
            ),
        }
    )


# Winnowing fingerprint (Schleimer, Wilkerson, Aiken: "Winnowing: Local
# Algorithms for Document Fingerprinting", SIGMOD 2003): k-gram rolling
# hashes → rightmost minimum per w-window → the selected set is a
# position-robust document sketch (shared substrings of length >= w+k-1
# always share a selected hash).
_WINNOW_BASE = np.int64(1000003)
_WINNOW_MASK = np.int64((1 << 61) - 1)


def _winnow_select(data: np.ndarray, k: int, w: int) -> np.ndarray:
    """Selected k-gram hashes of one byte sequence (sorted, distinct)."""
    n = data.size
    if n < k:
        return np.zeros(0, dtype=np.int64)
    # powers precompute in Python ints (no scalar-overflow warning;
    # the masked values are identical to the wrapping int64 compute)
    powers_py = [1] * k
    for j in range(1, k):
        powers_py[j] = (powers_py[j - 1] * int(_WINNOW_BASE)) & int(_WINNOW_MASK)
    powers = np.array(powers_py, dtype=np.int64)
    # hash of gram starting at i = sum data[i+j] * B^(k-1-j)  (masked)
    from numpy.lib.stride_tricks import sliding_window_view

    grams = sliding_window_view(data.astype(np.int64), k)
    # int64 products of byte × power wrap mod 2^64 — harmless: 2^61
    # divides 2^64, so the masked low 61 bits equal the exact product
    # mod 2^61, per-term sums of 61-bit values likewise survive any
    # wrap, and masking per step is the ring homomorphism of mod 2^61.
    # The result IS the documented polynomial hash mod 2^61 — pinned
    # against a from-the-paper pure-Python reference in
    # tests/test_stages.py::test_winnow_select_matches_reference.
    h = (grams * powers[::-1][None, :] & _WINNOW_MASK).sum(axis=1) & _WINNOW_MASK
    if h.size <= w:
        return np.unique(h[h.argmin() : h.argmin() + 1])
    wins = sliding_window_view(h, w)
    # rightmost minimum per window: reverse, argmin finds first = rightmost
    rev = wins[:, ::-1]
    pos = (w - 1) - rev.argmin(axis=1) + np.arange(wins.shape[0])
    return np.unique(h[np.unique(pos)])


def winnow_fingerprint_fn(k: int = 8, w: int = 16):
    """(doc_id, text) → winnowing sketch: ``n_selected`` (sketch size)
    and ``digest`` (md5-derived int64 of the sorted selected hashes) —
    the rolling-hash document fingerprint for plagiarism-style overlap
    detection.  Per-doc work is a few numpy passes bounded by the doc's
    own length; no cross-doc state."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ns = np.zeros(n, dtype=np.int64)
        dg = np.zeros(n, dtype=np.int64)
        texts = batch["text"].to_pylist()
        for i, t in enumerate(texts):
            sel = _winnow_select(
                np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8), k, w
            )
            ns[i] = sel.size
            d = hashlib.md5(sel.tobytes()).digest()[:8]
            dg[i] = np.frombuffer(d, dtype=np.int64)[0]
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_selected": pa.array(ns, pa.int64()),
                "digest": pa.array(dg, pa.int64()),
            }
        )

    return fn
