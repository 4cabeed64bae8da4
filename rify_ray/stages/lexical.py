"""Lexical / indexing operators over a document corpus: document
frequency, TF-IDF keyword extraction, and an inverted (postings) index.

These are the index-construction stages a web-scale training-data
pipeline runs after extraction (reference scope: the graft's
training-data surface, not `/root/reference` itself — rify has no
corpus ops).  Scale shape shared by all three:

- tokenization is one vectorized Arrow ``split_pattern`` per block (the
  flat token buffer, never a Python loop over rows);
- the only exchange is a ``groupby(term)`` over PER-BLOCK PARTIAL
  counts, so vocabulary-sized traffic crosses the wire, not tokens
  (Heaps' law: vocabulary ≪ corpus);
- the document-frequency table rides back into per-doc scoring as a
  ``ray.put`` broadcast below a row bound, a hash join above it;
- per-document top-k is computed LOCALLY inside the scoring map — a
  document lives in one row, so no final exchange is needed at all.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import drop_empty_blocks

# Terms are single-space-separated words (DuckDB ``string_split(text,
# ' ')`` semantics); empty tokens are dropped on both the Ray and the
# SQL side so double spaces cannot skew counts.


def _doc_terms(batch: pa.Table, text_col: str, id_col: str):
    """Explode a batch into (doc_id, term) pairs — one vectorized split
    over the flat buffer; returns (ids, terms) arrays including
    duplicates within a doc."""
    split = pc.split_pattern(batch[text_col], pattern=" ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    values = split.values
    offs = np.asarray(split.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
    counts = np.diff(offs)
    ids = pc.cast(batch[id_col], pa.int64()).to_numpy(zero_copy_only=False)
    rep_ids = np.repeat(ids, counts)
    keep = pc.not_equal(values, "")
    return pc.filter(pa.array(rep_ids, pa.int64()), keep), pc.filter(values, keep)


def _df_partial_fn(text_col: str, id_col: str):
    """Per-block combiner for document frequency: distinct terms per doc
    (a doc is one row, so per-block distinct-per-doc is globally exact),
    then local term counts — the exchange moves distinct terms per
    block."""

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        ids, terms = _doc_terms(batch, text_col, id_col)
        if len(terms) == 0:
            return empty
        pairs = pa.table({"d": ids, "term": terms}).group_by(["d", "term"]).aggregate([])
        vc = pc.value_counts(pairs["term"].combine_chunks())
        return pa.table(
            {
                "term": pc.cast(vc.field("values"), pa.string()),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return fn


def term_document_frequency(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Document frequency per term: ``(term, df)`` — per-block partial
    counts, one vocabulary-sized ``groupby(term).sum`` exchange."""
    parts = docs_ds.map_batches(
        _df_partial_fn(text_col, id_col), batch_format="pyarrow", zero_copy_batch=True
    )
    agg = drop_empty_blocks(parts.groupby("term").sum("cnt").materialize())
    schema = pa.schema([("term", pa.string()), ("df", pa.int64())])
    if agg is None:
        import ray.data

        return ray.data.from_arrow(schema.empty_table())

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return schema.empty_table()
        return pa.table(
            {
                "term": pc.cast(batch["term"], pa.string()),
                "df": pc.cast(batch["sum(cnt)"], pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_topk(
    docs_ds,
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_rows: int = 20_000_000,
    num_partitions: int = 8,
):
    """Top-``k`` TF-IDF keywords per document: ``(doc_id, term, tf, df,
    score)`` with ``score = tf / df`` (linear idf — the corpus size N is
    constant across terms, so ranking by ``tf·(N/df)`` equals ranking
    by ``tf/df``, and an IEEE double division is exactly rounded, hence
    bit-identical across engines — the same determinism discipline as
    the integer cross-multiplied Jaccard in ``dedup.ngram_jaccard``).
    Ties break ascending on ``term``.

    Physical plan: (1) :func:`term_document_frequency` — the only
    exchange, vocabulary-sized; (2) one scoring map over the docs with
    the df table attached as a ``ray.put`` broadcast (hash join above
    ``broadcast_rows``): tf counts, score, and the per-doc top-k all
    resolve inside the block because a document is a single row."""
    import polars as plr
    import ray
    import ray.data

    from ..util import polars_to_arrow_string

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("score", pa.float64()),
        ]
    )
    df_ds = term_document_frequency(docs_ds, text_col=text_col, id_col=id_col).materialize()
    vocab_n = df_ds.count()
    if vocab_n == 0:
        return ray.data.from_arrow(schema.empty_table())

    def tf_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        ids, terms = _doc_terms(batch, text_col, id_col)
        t = pa.table({"doc_id": ids, "term": terms})
        g = t.group_by(["doc_id", "term"]).aggregate([("term", "count")])
        return pa.table(
            {
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "term": pc.cast(g["term"], pa.string()),
                "tf": pc.cast(g["term_count"], pa.int64()),
            }
        )

    def topk_kernel(df: "plr.DataFrame") -> "plr.DataFrame":
        return (
            df.with_columns(
                (plr.col("tf").cast(plr.Float64) / plr.col("df")).alias("score")
            )
            .sort(["score", "term"], descending=[True, False])
            .group_by(["doc_id"], maintain_order=True)
            .head(k)
            .select(["doc_id", "term", "tf", "df", "score"])
        )

    if vocab_n <= broadcast_rows:
        tabs = [
            b
            for b in df_ds.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        lut = plr.from_arrow(pa.concat_tables(tabs))
        ref = ray.put(lut)

        def score(batch: pa.Table) -> pa.Table:
            tf = tf_pairs(batch)
            if tf.num_rows == 0:
                return schema.empty_table()
            lut_df: plr.DataFrame = ray.get(ref)
            out = topk_kernel(plr.from_arrow(tf).join(lut_df, on="term", how="inner"))
            return polars_to_arrow_string(out).cast(schema)

        return docs_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    # vocabulary too large to broadcast: explode (doc, term, tf), hash
    # join df by term, then the per-doc top-k runs as a grouped kernel
    tf_ds = drop_empty_blocks(
        docs_ds.map_batches(
            tf_pairs, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    )
    if tf_ds is None:
        return ray.data.from_arrow(schema.empty_table())
    joined = tf_ds.join(df_ds, "inner", num_partitions, on=("term",))

    def final(group: pa.Table) -> pa.Table:
        return polars_to_arrow_string(topk_kernel(plr.from_arrow(group))).cast(schema)

    return joined.groupby("doc_id").map_groups(final, batch_format="pyarrow")


def vocab_table(
    docs_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    broadcast_rows: int = 20_000_000,
):
    """Ranked vocabulary: ``(term, df, vocab_id)`` with ``vocab_id`` the
    1-based dense rank by (df desc, term asc) — the id-assignment step
    of building a tokenizer / embedding vocabulary.  ``min_df`` floors
    the document frequency (rare-term cutoff).

    Rank assignment needs a global total order, so it cannot be a pure
    per-block map.  Below ``broadcast_rows`` vocabulary rows the rank
    is one driver polars sort (vocabulary ≪ corpus by Heaps' law — the
    normal regime even at 100 TB).  Above it, a distributed sort
    range-partitions the vocabulary and ranks stream through the
    driver ONCE in bounded 64 k-row chunks, each re-``ray.put`` as it
    passes — memory-bounded, one extra pass, and honest about the
    driver hop (a rank is a prefix count; there is no shuffle-free
    distributed form without block-index APIs)."""
    import polars as plr
    import ray
    import ray.data

    schema = pa.schema(
        [("term", pa.string()), ("df", pa.int64()), ("vocab_id", pa.int64())]
    )
    df_ds = term_document_frequency(docs_ds, text_col=text_col, id_col=id_col)
    if min_df > 1:
        df_ds = df_ds.map_batches(
            lambda b: b.filter(pc.greater_equal(b["df"], min_df)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    df_ds = df_ds.materialize()
    n = df_ds.count()
    if n == 0:
        return ray.data.from_arrow(schema.empty_table())
    if n <= broadcast_rows:
        tabs = [
            b
            for b in df_ds.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        df = plr.from_arrow(pa.concat_tables(tabs)).sort(
            ["df", "term"], descending=[True, False]
        )
        df = df.with_columns(
            (plr.int_range(plr.len(), dtype=plr.Int64) + 1).alias("vocab_id")
        )
        return ray.data.from_arrow(df.to_arrow().cast(schema))
    ordered = df_ds.sort(["df", "term"], descending=[True, False])
    refs = []
    offset = 0
    for batch in ordered.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        ranks = pa.array(
            np.arange(offset + 1, offset + 1 + batch.num_rows, dtype=np.int64)
        )
        offset += batch.num_rows
        refs.append(ray.put(batch.append_column("vocab_id", ranks).cast(schema)))
    return ray.data.from_arrow_refs(refs)


def cooccurrence_topk(
    docs_ds,
    *,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_rows: int = 20_000_000,
):
    """Top-``k`` word collocations by LIFT: pairs of distinct terms
    co-occurring in the same document, ranked by
    ``pair_n · N / (df1 · df2)`` (lift = PMI without the log — the log
    is monotone, so the ranking is identical, and the score stays an
    exactly-computable integer ratio: int64 products below 2^53 are
    exact in doubles and the final division is exactly rounded).
    Pairs are ordered ``w1 < w2``; ``min_count`` floors the GLOBAL pair
    count and is applied AFTER the pair-keyed sum exchange (every
    pair's per-block partial crosses that exchange — the floor keeps
    counts exact; a per-block pre-filter would be an approximation and
    is deliberately not done).  The traffic bound on the exchange is
    the per-block combiner: at most one row per distinct pair per
    block.  Output: (w1, w2, pair_n, df1, df2, lift).

    Physical plan: per-block distinct (doc, term) explode → ONE
    vectorized within-block self-join on doc_id (a document lives in
    one row, so every pair forms inside its block — no pair exchange)
    → per-block pair counts (combiner) → one pair-keyed sum exchange →
    min_count filter → broadcast unigram-df attach → adaptive top-k."""
    import polars as plr
    import ray
    import ray.data

    from ..util import polars_to_arrow_string

    schema = pa.schema(
        [
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("pair_n", pa.int64()),
            ("df1", pa.int64()),
            ("df2", pa.int64()),
            ("lift", pa.float64()),
        ]
    )
    n_docs = docs_ds.count()
    if n_docs == 0:
        return ray.data.from_arrow(schema.empty_table())

    def pair_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids, terms = _doc_terms(batch, text_col, id_col)
        if len(terms) == 0:
            return empty
        w = plr.from_arrow(pa.table({"d": ids, "t": terms})).unique()
        pairs = (
            w.join(w, on="d")
            .filter(plr.col("t") < plr.col("t_right"))
            .group_by(["t", "t_right"])
            .len(name="cnt")
            .rename({"t": "w1", "t_right": "w2"})
            .with_columns(plr.col("cnt").cast(plr.Int64))
        )
        return polars_to_arrow_string(pairs).cast(empty.schema)

    parts = docs_ds.map_batches(
        pair_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = drop_empty_blocks(parts.groupby(["w1", "w2"]).sum("cnt").materialize())
    if agg is None:
        return ray.data.from_arrow(schema.empty_table())

    def floor_fn(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "pair_n": pa.array([], pa.int64()),
                }
            )
        cnt = pc.cast(batch["sum(cnt)"], pa.int64())
        keep = pc.greater_equal(cnt, min_count)
        return pa.table(
            {
                "w1": pc.cast(batch["w1"], pa.string()),
                "w2": pc.cast(batch["w2"], pa.string()),
                "pair_n": cnt,
            }
        ).filter(keep)

    floored = drop_empty_blocks(
        agg.map_batches(floor_fn, batch_format="pyarrow", zero_copy_batch=True).materialize()
    )
    if floored is None:
        return ray.data.from_arrow(schema.empty_table())

    df_ds = term_document_frequency(docs_ds, text_col=text_col, id_col=id_col).materialize()
    tabs = [
        b
        for b in df_ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    if not tabs:
        return ray.data.from_arrow(schema.empty_table())
    lut = plr.from_arrow(pa.concat_tables(tabs))
    if lut.height > broadcast_rows:
        # vocabulary beyond the broadcast bound: two hash joins
        d_ds = ray.data.from_arrow(polars_to_arrow_string(lut))
        one = drop_empty_blocks(
            floored.join(
                d_ds.map_batches(
                    lambda b: pa.table({"w1": b["term"], "df1": b["df"]}),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                ),
                "inner",
                8,
                on=("w1",),
            ).materialize()
        )
        if one is None:
            return ray.data.from_arrow(schema.empty_table())
        joined = one.join(
            d_ds.map_batches(
                lambda b: pa.table({"w2": b["term"], "df2": b["df"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "inner",
            8,
            on=("w2",),
        )
    else:
        ref = ray.put(lut)

        def attach(batch: pa.Table) -> pa.Table:
            t: plr.DataFrame = ray.get(ref)
            df = (
                plr.from_arrow(batch)
                .join(t.rename({"term": "w1", "df": "df1"}), on="w1")
                .join(t.rename({"term": "w2", "df": "df2"}), on="w2")
            )
            return polars_to_arrow_string(df)

        joined = floored.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        df = plr.from_arrow(batch).with_columns(
            (
                (plr.col("pair_n") * n_docs).cast(plr.Float64)
                / (plr.col("df1") * plr.col("df2"))
            ).alias("lift")
        )
        return polars_to_arrow_string(df.select(schema.names)).cast(schema)

    scored = drop_empty_blocks(
        joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).materialize()
    )
    if scored is None:
        return ray.data.from_arrow(schema.empty_table())
    if scored.count() <= broadcast_rows:
        tabs = [
            b
            for b in scored.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        df = (
            plr.from_arrow(pa.concat_tables(tabs))
            .sort(["lift", "w1", "w2"], descending=[True, False, False])
            .head(k)
        )
        return ray.data.from_arrow(df.to_arrow().cast(schema))
    return scored.sort(["lift", "w1", "w2"], descending=[True, False, False]).limit(k)


def postings_index(
    docs_ds,
    *,
    ngram: int = 2,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_rows: int = 20_000_000,
    num_partitions: int = 8,
):
    """Inverted index over word ``ngram``-grams: ``(term, df, postings)``
    where ``postings`` is the comma-joined ascending doc-id list and
    terms with ``df > max_df`` are dropped (stopword-like grams carry no
    retrieval signal and would otherwise make unbounded posting lists —
    the same df-cap semantics as ``dedup.ngram_jaccard_pairs``).

    Scale shape: the df cap is enforced BEFORE the posting-list
    exchange — exact dfs come from a vocabulary-sized partial-count
    groupby, the (small) hot-term set broadcasts as an anti-filter
    (hash anti-join above ``broadcast_rows``), so every
    ``groupby(term)`` group that builds a posting list is ≤ ``max_df``
    rows by construction."""
    import polars as plr
    import ray
    import ray.data

    from .corpus import _word_ngrams

    schema = pa.schema(
        [("term", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
    )

    def gram_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        grams, offs, valid = _word_ngrams(batch[text_col], ngram)
        if len(grams) == 0 or not valid.any():
            return empty
        counts = np.diff(offs)
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        # gram starting positions 0..n_tok-ngram map to the doc owning
        # that token position
        starts = np.repeat(ids, counts)[: len(valid)]
        t = pa.table(
            {
                "term": pc.filter(grams, pa.array(valid)),
                "doc_id": pa.array(starts[valid], pa.int64()),
            }
        )
        return t.group_by(["term", "doc_id"]).aggregate([])

    pairs = drop_empty_blocks(
        docs_ds.map_batches(
            gram_pairs, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    )
    if pairs is None:
        return ray.data.from_arrow(schema.empty_table())

    # exact dfs over the distinct (term, doc) pairs; hot-term anti-filter
    agg = drop_empty_blocks(pairs.groupby("term").count().materialize())
    if agg is None:
        return ray.data.from_arrow(schema.empty_table())

    def hot_only(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table({"term": pa.array([], pa.string())})
        cnt = batch["count()"]
        return pa.table(
            {"term": pc.cast(pc.filter(batch["term"], pc.greater(cnt, max_df)), pa.string())}
        )

    hot = drop_empty_blocks(
        agg.map_batches(hot_only, batch_format="pyarrow", zero_copy_batch=True).materialize()
    )
    if hot is not None:
        n_hot = hot.count()
        if n_hot <= broadcast_rows:
            hot_tabs = [
                b
                for b in hot.iter_batches(batch_size=None, batch_format="pyarrow")
                if b.num_rows and b.num_columns
            ]
            hot_ref = ray.put(pa.concat_tables(hot_tabs)["term"].combine_chunks())

            def drop_hot(batch: pa.Table) -> pa.Table:
                hs = ray.get(hot_ref)
                return batch.filter(pc.invert(pc.is_in(batch["term"], value_set=hs)))

            pairs = pairs.map_batches(drop_hot, batch_format="pyarrow", zero_copy_batch=True)
        else:
            pairs = pairs.join(hot, "left_anti", num_partitions, on=("term",))

    def build(group: pa.Table) -> pa.Table:
        df = (
            plr.from_arrow(group)
            .group_by("term")
            .agg(
                plr.col("doc_id").count().alias("df"),
                plr.col("doc_id")
                .sort()
                .cast(plr.String)
                .str.join(",")
                .alias("postings"),
            )
        )
        out = df.to_arrow()
        return pa.table(
            {
                "term": pc.cast(out["term"], pa.string()),
                "df": pc.cast(out["df"], pa.int64()),
                "postings": pc.cast(out["postings"], pa.string()),
            }
        )

    return pairs.groupby("term").map_groups(build, batch_format="pyarrow")
