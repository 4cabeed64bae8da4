"""Lexical / indexing operators (TF-IDF keyword extraction, inverted
postings index, per-key cap) vs brute-force Python references, on both
the broadcast and the forced-distributed physical branches."""

import pyarrow as pa
import polars as pl
import pytest

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry cherry date"),
    (2, "apple apple apple elder"),
    (3, "date elder fig fig fig"),
    (4, "apple banana"),
]


def _docs_ds():
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    ).repartition(3)


def _collect(ds):
    tabs = [
        b
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    return pl.from_arrow(pa.concat_tables(tabs)) if tabs else None


def brute_tfidf(k):
    from collections import Counter

    df = Counter()
    tfs = {}
    for doc_id, text in DOCS:
        toks = [t for t in text.split(" ") if t]
        tf = Counter(toks)
        tfs[doc_id] = tf
        for t in tf:
            df[t] += 1
    rows = []
    for doc_id, tf in tfs.items():
        scored = sorted(
            ((tf[t] / df[t], t) for t in tf), key=lambda x: (-x[0], x[1])
        )[:k]
        for score, t in scored:
            rows.append((doc_id, t, tf[t], df[t], score))
    return sorted(rows)


def brute_postings(n, max_df):
    grams = {}
    for doc_id, text in DOCS:
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            grams.setdefault(" ".join(toks[i : i + n]), set()).add(doc_id)
    return sorted(
        (term, len(ids), ",".join(str(i) for i in sorted(ids)))
        for term, ids in grams.items()
        if len(ids) <= max_df
    )


@pytest.mark.parametrize("broadcast_rows", [20_000_000, 0])
def test_tfidf_topk_matches_brute(ray_session, broadcast_rows):
    from rify_ray.stages.lexical import tfidf_topk

    out = _collect(tfidf_topk(_docs_ds(), k=2, broadcast_rows=broadcast_rows))
    got = sorted(map(tuple, out.rows()))
    assert got == brute_tfidf(2)


def test_tfidf_score_is_exact_division(ray_session):
    from rify_ray.stages.lexical import tfidf_topk

    out = _collect(tfidf_topk(_docs_ds(), k=10))
    for doc_id, term, tf, df, score in out.rows():
        assert score == tf / df  # bit-exact IEEE division


@pytest.mark.parametrize("broadcast_rows", [20_000_000, 0])
def test_postings_index_matches_brute(ray_session, broadcast_rows):
    from rify_ray.stages.lexical import postings_index

    out = _collect(
        postings_index(_docs_ds(), ngram=2, max_df=10, broadcast_rows=broadcast_rows)
    )
    assert sorted(map(tuple, out.rows())) == brute_postings(2, 10)


def test_postings_df_cap_drops_hot_terms(ray_session):
    from rify_ray.stages.lexical import postings_index

    # unigrams: 'apple'/'banana' appear in 3 docs, a max_df of 2 drops
    # them; 'cherry' (df=2) stays
    out = _collect(postings_index(_docs_ds(), ngram=1, max_df=2))
    terms = set(out["term"].to_list())
    assert "apple" not in terms and "banana" not in terms and "cherry" in terms
    assert sorted(map(tuple, out.rows())) == brute_postings(1, 2)


def test_per_key_cap_keeps_first_k(ray_session):
    import ray.data

    from rify_ray.stages.corpus import per_key_cap

    t = pa.table(
        {
            "doc_id": pa.array([5, 3, 1, 4, 2, 6], pa.int64()),
            "source": pa.array(["a", "a", "a", "b", "b", "b"], pa.string()),
        }
    )
    out = _collect(
        per_key_cap(
            ray.data.from_arrow(t).repartition(3),
            key_cols=["source"],
            order_col="doc_id",
            k=2,
        )
    )
    got = sorted(map(tuple, out.rows()))
    assert got == [(1, "a"), (2, "b"), (3, "a"), (4, "b")]


def test_term_document_frequency(ray_session):
    from rify_ray.stages.lexical import term_document_frequency

    out = _collect(term_document_frequency(_docs_ds()))
    got = dict(zip(out["term"].to_list(), out["df"].to_list()))
    assert got["apple"] == 3 and got["fig"] == 1 and got["cherry"] == 2


# ---------------------------------------------------------------------------
# snapshot-incremental exact dedup (persistent digest store)
# ---------------------------------------------------------------------------


def _snap_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(2)


@pytest.mark.parametrize("broadcast_rows", [20_000_000, 0])
def test_incremental_dedup_recrawl_semantics(ray_session, tmp_path, broadcast_rows):
    from rify_ray.stages.dedup import incremental_exact_dedup

    state = str(tmp_path / "digests")
    snap1 = [(0, "alpha"), (1, "beta"), (2, "alpha")]  # within-snapshot dup
    out1, seen1 = incremental_exact_dedup(
        _snap_ds(snap1), state, broadcast_rows=broadcast_rows
    )
    ids1 = sorted(_collect(out1)["doc_id"].to_list())
    assert ids1 == [0, 1] and seen1 == 0

    # snapshot 2: one doc already seen, one new dup'd within, one fresh
    snap2 = [(10, "alpha"), (11, "gamma"), (12, "gamma"), (13, "delta")]
    out2, seen2 = incremental_exact_dedup(
        _snap_ds(snap2), state, broadcast_rows=broadcast_rows
    )
    ids2 = sorted(_collect(out2)["doc_id"].to_list())
    assert ids2 == [11, 13] and seen2 == 2

    # rerun of the committed snapshot returns empty (now all seen)
    out3, seen3 = incremental_exact_dedup(
        _snap_ds(snap2), state, broadcast_rows=broadcast_rows
    )
    assert _collect(out3) is None or _collect(out3).height == 0
    assert seen3 == 4


def test_incremental_dedup_commit_false_leaves_store(ray_session, tmp_path):
    import os

    from rify_ray.stages.dedup import incremental_exact_dedup

    state = str(tmp_path / "digests")
    incremental_exact_dedup(_snap_ds([(0, "a")]), state)
    before = sorted(os.listdir(state))
    out, _ = incremental_exact_dedup(_snap_ds([(1, "b")]), state, commit=False)
    assert sorted(_collect(out)["doc_id"].to_list()) == [1]
    assert sorted(os.listdir(state)) == before  # dry run: no new part


def test_incremental_dedup_part_numbering_gap_safe(ray_session, tmp_path):
    """Part index is max(existing)+1, so a gap from a manually removed
    part never makes a commit overwrite a later part's digests; and a
    tmp colliding with a committed part fails loudly (single-writer)."""
    import os

    from rify_ray.stages.dedup import incremental_exact_dedup

    state = str(tmp_path / "digests")
    incremental_exact_dedup(_snap_ds([(0, "a")]), state)  # digests-00000
    incremental_exact_dedup(_snap_ds([(1, "b")]), state)  # digests-00001
    incremental_exact_dedup(_snap_ds([(2, "c")]), state)  # digests-00002
    # operator removes the middle part: len(parts)=2 but max index is 2
    os.remove(os.path.join(state, "digests-00001.parquet"))
    incremental_exact_dedup(_snap_ds([(3, "d")]), state)
    names = sorted(os.listdir(state))
    # the new part is 00003 — 00002 ("c") was NOT overwritten
    assert names == [
        "digests-00000.parquet",
        "digests-00002.parquet",
        "digests-00003.parquet",
    ]
    out, _ = incremental_exact_dedup(_snap_ds([(9, "c")]), state, commit=False)
    got = _collect(out)
    assert got is None or got.height == 0  # "c" still seen


def brute_cooccur(min_count):
    from collections import Counter
    from itertools import combinations

    df = Counter()
    pair = Counter()
    for _, text in DOCS:
        terms = sorted({t for t in text.split(" ") if t})
        df.update(terms)
        pair.update(combinations(terms, 2))
    n = len(DOCS)
    rows = []
    for (w1, w2), c in pair.items():
        if c >= min_count:
            rows.append((w1, w2, c, df[w1], df[w2], (c * n) / (df[w1] * df[w2])))
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows


@pytest.mark.parametrize("broadcast_rows", [20_000_000, 0])
def test_cooccurrence_topk_matches_brute(ray_session, broadcast_rows):
    from rify_ray.stages.lexical import cooccurrence_topk

    out = _collect(
        cooccurrence_topk(
            _docs_ds(), k=50, min_count=1, broadcast_rows=broadcast_rows
        )
    )
    got = list(map(tuple, out.rows()))
    want = brute_cooccur(1)[:50]
    assert got == want and len(want) >= 8


@pytest.mark.parametrize("broadcast_rows", [20_000_000, 0])
def test_vocab_table_rank_matches_brute(ray_session, broadcast_rows):
    from collections import Counter

    from rify_ray.stages.lexical import vocab_table

    df = Counter()
    for _, text in DOCS:
        df.update({t for t in text.split(" ") if t})
    ranked = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
    want = [(t, d, i + 1) for i, (t, d) in enumerate(ranked)]
    out = _collect(vocab_table(_docs_ds(), broadcast_rows=broadcast_rows))
    got = sorted(map(tuple, out.rows()), key=lambda r: r[2])
    assert got == want

    # min_df floors the vocabulary but keeps the dense rank
    out2 = _collect(vocab_table(_docs_ds(), min_df=2, broadcast_rows=broadcast_rows))
    kept = [(t, d, i + 1) for i, (t, d) in enumerate([x for x in ranked if x[1] >= 2])]
    assert sorted(map(tuple, out2.rows()), key=lambda r: r[2]) == kept
