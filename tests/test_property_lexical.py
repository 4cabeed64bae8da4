"""Property-based checks for the lexical operators: on random tiny
corpora the distributed plans must equal the brute-force reference
semantics exactly (same discipline as test_property_conformance for
the engine).  Example counts are small — each example runs real Ray
Data pipelines."""

from collections import Counter
from itertools import combinations

import pyarrow as pa
import polars as pl
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["aa", "bb", "cc", "dd", "ee"]

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def corpus_strategy(draw):
    n_docs = draw(st.integers(min_value=1, max_value=6))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(min_value=1, max_value=8))
        words = [draw(st.sampled_from(WORDS)) for _ in range(n_words)]
        docs.append((i, " ".join(words)))
    return docs


def _ds(docs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    ).repartition(2)


def _collect(ds):
    tabs = [
        b
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    return pl.from_arrow(pa.concat_tables(tabs)) if tabs else None


@SETTINGS
@given(docs=corpus_strategy(), k=st.integers(min_value=1, max_value=4))
def test_tfidf_property(ray_session, docs, k):
    from rify_ray.stages.lexical import tfidf_topk

    df_counts = Counter()
    tfs = {}
    for doc_id, text in docs:
        tf = Counter(text.split(" "))
        tfs[doc_id] = tf
        df_counts.update(tf.keys())
    want = []
    for doc_id, tf in tfs.items():
        ranked = sorted(
            ((tf[t] / df_counts[t], t) for t in tf), key=lambda x: (-x[0], x[1])
        )[:k]
        for score, t in ranked:
            want.append((doc_id, t, tf[t], df_counts[t], score))
    out = _collect(tfidf_topk(_ds(docs), k=k))
    got = sorted(map(tuple, out.rows())) if out is not None else []
    assert got == sorted(want)


@SETTINGS
@given(docs=corpus_strategy(), max_df=st.integers(min_value=1, max_value=6))
def test_postings_property(ray_session, docs, max_df):
    from rify_ray.stages.lexical import postings_index

    grams = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        for i in range(len(toks) - 1):
            grams.setdefault(toks[i] + " " + toks[i + 1], set()).add(doc_id)
    want = sorted(
        (t, len(ids), ",".join(map(str, sorted(ids))))
        for t, ids in grams.items()
        if len(ids) <= max_df
    )
    out = _collect(postings_index(_ds(docs), ngram=2, max_df=max_df))
    got = sorted(map(tuple, out.rows())) if out is not None else []
    assert got == want


@SETTINGS
@given(docs=corpus_strategy())
def test_cooccurrence_property(ray_session, docs):
    from rify_ray.stages.lexical import cooccurrence_topk

    df_counts = Counter()
    pair = Counter()
    for _, text in docs:
        terms = sorted(set(text.split(" ")))
        df_counts.update(terms)
        pair.update(combinations(terms, 2))
    n = len(docs)
    want = sorted(
        (
            (w1, w2, c, df_counts[w1], df_counts[w2], (c * n) / (df_counts[w1] * df_counts[w2]))
            for (w1, w2), c in pair.items()
        ),
        key=lambda r: (-r[5], r[0], r[1]),
    )[:100]
    out = _collect(cooccurrence_topk(_ds(docs), k=100, min_count=1))
    got = list(map(tuple, out.rows())) if out is not None else []
    assert got == want
