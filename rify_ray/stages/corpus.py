"""Corpus-level training-data ops over the ``documents`` table:
deterministic sampling, decontamination, corpus n-gram top-k, and
Gopher-style repetition statistics.

Like :mod:`rify_ray.stages.text`, the semantics are deliberately
SQL-expressible so the DuckDB oracle verifies each op value-for-value
(``__ray_entry__.oracle_sql``).  The physical plans are the scale story:

- ``stable_sample`` is a pure per-batch filter — no shuffle, no RNG
  state, the same row always lands the same way, so a resumed or re-run
  100 TB sample is byte-identical to the first attempt.
- ``decontaminate`` is a broadcast blocklist applied as vectorized
  substring kernels — O(patterns) Arrow kernel calls per batch, not a
  Python row loop.
- ``ngram_topk`` pre-aggregates per block (combiner) so the single
  ``groupby`` exchange moves distinct-gram partial counts, not one row
  per token; top-k resolves on the driver below a bound and as a
  distributed sort+limit above it.
- ``repetition_stats`` is per-doc bounded work inside ``map_batches``
  (one sort per doc over its own tokens), embarrassingly parallel.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import drop_empty_blocks

# Knuth multiplicative hash; the SQL twin is
#   (doc_id * 2654435761 % 4294967296) % mod < pct
# Exact in int64 for ids < 2^32 (the product stays below 2^63).
_KNUTH = 2654435761
_KNUTH_MOD = 4294967296


def _knuth_hash(batch: pa.Table, key_col: str) -> np.ndarray:
    """The ONE place encoding the deterministic sampling hash (guard
    included) — shared by stable/stratified/mixture sampling so the
    semantics cannot drift between them."""
    ids = np.asarray(
        pc.cast(batch[key_col], pa.int64()).to_numpy(zero_copy_only=False),
        dtype=np.int64,
    )
    if ids.size and int(ids.max()) >= _KNUTH_MOD:
        raise ValueError(
            f"deterministic sampling requires {key_col} < 2^32 for exact int64 hashing"
        )
    return ids * _KNUTH % _KNUTH_MOD


def stable_sample(docs_ds, *, pct: int = 10, mod: int = 100, key_col: str = "doc_id"):
    """Deterministic hash sample: keep rows whose Knuth multiplicative
    hash of ``key_col`` mod ``mod`` falls below ``pct``.

    This is how a web-scale pipeline samples: stable under retries,
    resumable, stratifiable by key range — never ``random()`` (which
    changes per attempt and can't be oracle-checked).  Ids must be below
    2^32 so the int64 product is exact (asserted per batch)."""

    def fn(batch: pa.Table) -> pa.Table:
        keep = _knuth_hash(batch, key_col) % mod < pct
        return batch.filter(pa.array(keep))

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate(docs_ds, patterns: Sequence[str], *, text_col: str = "text"):
    """Drop documents containing ANY of the blocklist phrases (literal
    substring match) — eval-set decontamination.

    The blocklist ships inside the task closure (broadcast once per
    worker, not per batch) and each phrase is one vectorized
    ``match_substring`` kernel over the batch, OR-folded.  For very
    large blocklists swap the per-pattern fold for a single combined
    RE2 alternation / Aho-Corasick pass; the per-batch shape (filter
    map, no shuffle) is unchanged."""
    pats: List[str] = list(patterns)

    def fn(batch: pa.Table) -> pa.Table:
        mask = None
        for p in pats:
            m = pc.match_substring(batch[text_col], p)
            mask = m if mask is None else pc.or_(mask, m)
        if mask is None:
            return batch
        return batch.filter(pc.invert(mask))

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _bigram_counts_fn(text_col: str):
    """Per-block combiner: tokenize (split on a single space, exactly
    DuckDB's ``string_split``), form word bigrams with one vectorized
    Arrow join over the flat token buffer, and emit LOCAL (gram, cnt)
    partial counts via ``value_counts`` — the downstream exchange then
    moves distinct grams per block, not tokens."""

    def fn(batch: pa.Table) -> pa.Table:
        split = pc.split_pattern(batch[text_col], pattern=" ")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        values = split.values
        offs = np.asarray(split.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
        n_tok = len(values)
        if n_tok < 2:
            return pa.table({"gram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        grams = pc.binary_join_element_wise(
            values.slice(0, n_tok - 1), values.slice(1, n_tok - 1), " "
        )
        # bigrams spanning a document boundary are invalid: position
        # (doc_end - 1) joins doc d's last token to doc d+1's first
        mask = np.ones(n_tok - 1, dtype=bool)
        ends = offs[1:] - 1
        ends = ends[(ends >= 0) & (ends < n_tok - 1)]
        mask[ends] = False
        vc = pc.value_counts(pc.filter(grams, pa.array(mask)))
        return pa.table(
            {
                "gram": pc.cast(vc.field("values"), pa.string()),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return fn


def ngram_topk(
    docs_ds,
    *,
    k: int = 20,
    text_col: str = "text",
    broadcast_rows: int = 2_000_000,
):
    """Top-``k`` corpus word bigrams by count, ties broken by gram
    (ascending) — the classic corpus-statistics op for boilerplate and
    contamination discovery.

    Physical plan: per-block combiner (:func:`_bigram_counts_fn`) → one
    ``groupby(gram).sum`` exchange over partial counts → top-k.  The
    top-k resolves on the driver when the aggregated vocabulary is
    below ``broadcast_rows`` (one polars sort, no sort exchange);
    above it, a distributed ``sort().limit(k)`` runs instead — the
    aggregated set is distinct n-grams, already orders of magnitude
    smaller than the corpus."""
    parts = docs_ds.map_batches(
        _bigram_counts_fn(text_col), batch_format="pyarrow", zero_copy_batch=True
    )
    agg = parts.groupby("gram").sum("cnt").materialize()
    agg = drop_empty_blocks(agg)
    if agg is None:
        return _empty_topk()

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.schema([("gram", pa.string()), ("cnt", pa.int64())]).empty_table()
        return pa.table(
            {
                "gram": pc.cast(batch["gram"], pa.string()),
                "cnt": pc.cast(batch["sum(cnt)"], pa.int64()),
            }
        )

    agg = agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n = agg.count()
    if n == 0:
        return _empty_topk()
    if n <= broadcast_rows:
        import polars as pl
        import ray.data

        tabs = [
            b
            for b in agg.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        df = (
            pl.from_arrow(pa.concat_tables(tabs))
            .sort(["cnt", "gram"], descending=[True, False])
            .head(k)
        )
        return ray.data.from_arrow(
            df.to_arrow().cast(pa.schema([("gram", pa.string()), ("cnt", pa.int64())]))
        )
    return agg.sort(["cnt", "gram"], descending=[True, False]).limit(k)


def _empty_topk():
    import ray.data

    return ray.data.from_arrow(
        pa.schema([("gram", pa.string()), ("cnt", pa.int64())]).empty_table()
    )


def grouped_topk(
    ds,
    *,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_col: str,
    k: int,
    descending: bool = True,
    broadcast_rows: int = 2_000_000,
    forced_shuffle: bool = False,
):
    """Top-``k`` rows per key by ``order_col`` (ties broken ascending on
    ``tiebreak_col``) — e.g. the k highest-quality documents per source.

    Scale shape: a per-block PARTIAL top-k runs first (one vectorized
    polars sort + head per block), so at most ``k`` rows per key per
    block cross the exchange — the combiner discipline that keeps a
    per-key top-k from shuffling the whole table.  The final merge is
    adaptive: driver fold below ``broadcast_rows`` partial rows, a
    ``groupby(key).map_groups`` of the same kernel above it
    (``forced_shuffle`` pins that branch for tests)."""
    import polars as plr
    import ray.data

    keys = list(key_cols)
    by = [order_col, tiebreak_col]
    desc = [descending, False]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = (
            plr.from_arrow(batch)
            .sort(by, descending=desc)
            .group_by(keys, maintain_order=True)
            .head(k)
        )
        return df.select(batch.column_names).to_arrow().cast(batch.schema)

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n = parts.count()
    if n == 0:
        return parts
    schema = parts.schema().base_schema
    if not forced_shuffle and n <= broadcast_rows:
        tabs = [
            b
            for b in parts.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        df = (
            plr.from_arrow(pa.concat_tables(tabs))
            .sort(by, descending=desc)
            .group_by(keys, maintain_order=True)
            .head(k)
        )
        return ray.data.from_arrow(df.select(schema.names).to_arrow().cast(schema))

    def final(group: pa.Table) -> pa.Table:
        return (
            plr.from_arrow(group)
            .sort(by, descending=desc)
            .head(k)
            .select(group.column_names)
            .to_arrow()
            .cast(group.schema)
        )

    return parts.groupby(keys).map_groups(final, batch_format="pyarrow")


# HyperLogLog sketch: per-block registers merge by elementwise max — the
# canonical mergeable-aggregate shape (Flajolet et al., 2007).  Each
# block contributes a 2^p-byte register array regardless of row count,
# so the "exchange" is a constant-size reduction.
_HLL_HASH_A = np.uint64(0x9E3779B97F4A7C15)


def _hll_registers(ids: np.ndarray, p: int) -> np.ndarray:
    """Vectorized register computation over int64 keys: one
    multiply-xor-shift hash per row, bucket = low p bits, rank =
    leading-zero count of the remaining 64-p bits + 1."""
    m = 1 << p
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint64) * _HLL_HASH_A
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(32)
    bucket = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(p)
    width = 64 - p
    # rank = width - floor(log2(rest)) for rest>0; width+1 for rest==0
    nz = rest > 0
    rank = np.full(ids.size, width + 1, dtype=np.int64)
    if nz.any():
        bits = np.frexp(rest[nz].astype(np.float64))[1]  # position of MSB
        rank[nz] = width - bits + 1
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_distinct(ds, col: str, *, p: int = 12) -> float:
    """Approximate distinct count of an int64 column via HyperLogLog
    (standard bias-corrected estimator, 2^p registers ≈ 1.04/√2^p
    relative error — ~1.6% at the default p=12).

    Each block reduces to one constant-size register array inside
    ``map_batches``; the driver merges them with an elementwise max —
    no shuffle, no per-key state, the aggregation a 100 TB distinct
    count actually uses when exactness isn't required (the exact
    variant is a ``groupby`` away, at full exchange cost)."""
    m = 1 << p

    def block_regs(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            pc.cast(batch[col], pa.int64()).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        regs = _hll_registers(ids, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(m, dtype=np.int64)
    for b in ds.map_batches(
        block_regs, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows == 0 or b.num_columns == 0:
            continue
        for rb in b["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(rb, dtype=np.int64), out=merged)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -merged.astype(np.float64)))
    zeros = int((merged == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def redact(docs_ds, pattern: str, replacement: str = "[REDACTED]", *, text_col: str = "text"):
    """PII-style pattern redaction: replace every match of an RE2
    ``pattern`` in ``text_col`` with ``replacement``.

    One vectorized ``replace_substring_regex`` kernel per batch — a pure
    streaming map, no shuffle, no state; the shape a 100 TB scrub pass
    (emails, phone numbers, keys) runs as.  The row shape is preserved:
    ``text_col`` is replaced in place and every other column passes
    through.  Both Arrow and DuckDB use RE2, so ``regexp_replace(text,
    pattern, replacement, 'g')`` is the exact SQL twin."""

    def fn(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index(text_col)
        return batch.set_column(
            idx,
            text_col,
            pc.replace_substring_regex(batch[text_col], pattern, replacement),
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    docs_ds,
    *,
    strata_col: str = "source",
    key_col: str = "doc_id",
    k: int = 5,
    forced_shuffle: bool = False,
):
    """Deterministic stratified sample: the ``k`` rows per stratum whose
    Knuth multiplicative hash of ``key_col`` ranks lowest (ties broken
    by the key itself) — per-source balancing for training-data mixes,
    stable under retries like :func:`stable_sample`.

    Physically this is :func:`grouped_topk` ordered ascending on the
    hash, so the per-block partial top-k combiner applies: at most
    ``k`` rows per stratum per block cross the exchange.  SQL twin:
    ``QUALIFY row_number() OVER (PARTITION BY strata ORDER BY
    (key * 2654435761 % 4294967296), key) <= k``."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_h", pa.array(_knuth_hash(batch, key_col), pa.int64())
        )

    hashed = docs_ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(
        hashed,
        key_cols=[strata_col],
        order_col="_h",
        tiebreak_col=key_col,
        k=k,
        descending=False,
        forced_shuffle=forced_shuffle,
    )

    def drop_hash(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["_h"]) if "_h" in batch.column_names else batch

    return out.map_batches(drop_hash, batch_format="pyarrow", zero_copy_batch=True)


def per_key_cap(
    ds,
    *,
    key_cols: Sequence[str] = ("source",),
    order_col: str = "doc_id",
    k: int = 100,
    forced_shuffle: bool = False,
):
    """Cap the number of rows kept per key: the FIRST ``k`` rows per
    ``key_cols`` in ascending ``order_col`` order — the per-domain
    document cap every web-crawl curation pipeline applies so no single
    site dominates the training mix (e.g. C4 / RefinedWeb-style host
    caps).

    Physically :func:`grouped_topk` ordered ascending, so the per-block
    partial combiner bounds exchange traffic at ``k`` rows per key per
    block.  SQL twin: ``QUALIFY row_number() OVER (PARTITION BY key
    ORDER BY order_col) <= k``."""
    return grouped_topk(
        ds,
        key_cols=key_cols,
        order_col=order_col,
        tiebreak_col=order_col,
        k=k,
        descending=False,
        forced_shuffle=forced_shuffle,
    )


def quantile_threshold(
    ds,
    value_col: str,
    q: float,
    *,
    driver_values_bound: int = 5_000_000,
) -> int:
    """Exact global discrete quantile (DuckDB ``quantile_disc``: the
    element at ``max(0, ceil(q*n) - 1)`` of the sorted values) of an
    integer column, computed WITHOUT a sort exchange.

    Each block reduces to (value, cnt) partial histograms via
    ``value_counts`` — for bounded-domain columns (basis points, cents,
    bucketed scores) the merged histogram is tiny regardless of row
    count, the same mergeable-aggregate shape as :func:`hll_distinct`.
    The driver folds histograms and walks the cumulative counts to the
    quantile.  Raises if the merged domain exceeds
    ``driver_values_bound`` — for unbounded domains use
    :class:`MPQuantileSketch` (same per-block reduction shape,
    approximate walk)."""

    def block_hist(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.cast(batch[value_col], pa.int64()))
        return pa.table(
            {
                "v": pc.cast(vc.field("values"), pa.int64()),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    vs_parts, cs_parts = [], []
    for b in ds.map_batches(
        block_hist, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows == 0 or b.num_columns == 0:
            continue
        vs_parts.append(np.asarray(b["v"].to_numpy(zero_copy_only=False), np.int64))
        cs_parts.append(np.asarray(b["cnt"].to_numpy(zero_copy_only=False), np.int64))
        if sum(p.size for p in vs_parts) > driver_values_bound:
            raise ValueError(
                "quantile_threshold: value domain exceeds driver bound; "
                "use a mergeable quantile sketch for unbounded domains"
            )
    if not vs_parts:
        raise ValueError("quantile_threshold on an empty dataset")
    # vectorized merge: sort distinct values once, fold counts natively
    vs = np.concatenate(vs_parts)
    cs = np.concatenate(cs_parts)
    uniq, inv = np.unique(vs, return_inverse=True)
    if uniq.size > driver_values_bound:
        raise ValueError(
            "quantile_threshold: value domain exceeds driver bound; "
            "use a mergeable quantile sketch for unbounded domains"
        )
    counts = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(counts, inv, cs)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    idx = max(0, int(np.ceil(q * n)) - 1)
    return int(uniq[np.searchsorted(cum, idx, side="right")])


def repetition_stats_fn(text_col: str = "text"):
    """(doc_id, text) → Gopher-style repetition features, integer basis
    points so the SQL twin matches exactly:

    - ``dup_word_bp`` = 10000 * (tokens − distinct tokens) / tokens
    - ``top_word_bp`` = 10000 * max single-token count / tokens

    Tokenization is ``string_split(text, ' ')`` (single space, empties
    kept), identical to the oracle.  Per-doc work is one sort over that
    doc's own tokens — bounded by doc length, no cross-doc state."""

    def fn(batch: pa.Table) -> pa.Table:
        split = pc.split_pattern(batch[text_col], pattern=" ")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.values.to_numpy(zero_copy_only=False)
        offs = np.asarray(split.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
        n = batch.num_rows
        dup_bp = np.zeros(n, dtype=np.int64)
        top_bp = np.zeros(n, dtype=np.int64)
        for i in range(n):
            toks = flat[offs[i] : offs[i + 1]]
            total = toks.size
            if total == 0:
                continue
            _, counts = np.unique(toks, return_counts=True)
            dup_bp[i] = 10_000 * (total - counts.size) // total
            top_bp[i] = 10_000 * int(counts.max()) // total
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "dup_word_bp": pa.array(dup_bp, pa.int64()),
                "top_word_bp": pa.array(top_bp, pa.int64()),
            }
        )

    return fn


def _word_ngrams(text_arr, n: int):
    """Vectorized word n-grams over a batch: one ``split_pattern`` +
    (n-1) ``binary_join_element_wise`` calls over the flat token buffer;
    grams spanning a document boundary are masked out.  Returns
    (grams array, doc offsets) so callers can map grams back to rows."""
    split = pc.split_pattern(text_arr, pattern=" ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    values = split.values
    offs = np.asarray(split.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
    n_tok = len(values)
    if n_tok < n:
        return pa.array([], pa.string()), offs, np.zeros(0, dtype=bool)
    parts = [values.slice(i, n_tok - n + 1) for i in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = pc.binary_join_element_wise(grams, p, " ")
    # a gram starting at position j is valid iff j+n-1 is in the same doc:
    # invalid starts are the n-1 positions before each doc end
    valid = np.ones(n_tok - n + 1, dtype=bool)
    for d in range(1, n):
        ends = offs[1:] - d
        ends = ends[(ends >= 0) & (ends < n_tok - n + 1)]
        valid[ends] = False
    return grams, offs, valid


def ngram_decontaminate(
    docs_ds,
    eval_texts: Sequence[str],
    *,
    n: int = 5,
    text_col: str = "text",
):
    """N-gram-overlap decontamination (the Dolma/GPT-3 discipline,
    stronger than substring blocklists): drop every document sharing
    ANY word ``n``-gram with the held-out eval texts.

    The eval side is tiny by definition, so its gram set is computed
    once on the driver and broadcast inside the task closure; each batch
    then runs one vectorized gram build (:func:`_word_ngrams`) and one
    ``is_in`` membership kernel — a pure streaming filter, no shuffle,
    O(batch tokens) per batch at any corpus size."""
    eval_grams: set = set()
    for t in eval_texts:
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            eval_grams.add(" ".join(toks[i : i + n]))
    gram_arr = pa.array(sorted(eval_grams), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or len(gram_arr) == 0:
            return batch
        grams, offs, valid = _word_ngrams(batch[text_col], n)
        if len(grams) == 0:
            return batch
        hit = np.asarray(
            pc.and_(
                pc.is_in(grams, value_set=gram_arr),
                pa.array(valid),
            ).to_numpy(zero_copy_only=False)
        )
        # map gram start positions back to rows: row i owns starts in
        # [offs[i], offs[i+1] - n + 1)
        starts = np.flatnonzero(hit)
        bad_rows = np.unique(np.searchsorted(offs, starts, side="right") - 1)
        keep = np.ones(batch.num_rows, dtype=bool)
        keep[bad_rows] = False
        return batch.filter(pa.array(keep))

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64/murmur3 finalizer — full-avalanche 64-bit scramble."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(33))
        x = x * _MIX1
        x = x ^ (x >> np.uint64(29))
        x = x * _MIX2
        x = x ^ (x >> np.uint64(32))
    return x


def stable_str_hash64(arr, seed: int) -> np.ndarray:
    """Version-stable vectorized 64-bit string hash: a seeded
    polynomial accumulation over the utf-8 bytes (pure numpy uint64
    wraparound — bit-identical on every platform and library version)
    finished with a splitmix64 scramble.  Replaces polars
    ``Series.hash``, whose value is NOT stable across polars
    releases/platforms — in a cluster mixing polars builds that would
    silently break Bloom-filter no-false-negative guarantees."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.large_string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    offs_abs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    start, end = int(offs_abs[0]), int(offs_abs[-1])
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[start:end]
    offs = (offs_abs - start).astype(np.int64)
    lengths = np.diff(offs)
    seed64 = _mix64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    with np.errstate(over="ignore"):
        base = (seed64 * _MIX2) | np.uint64(1)  # odd ⇒ invertible mod 2^64
        if data.size:
            maxlen = int(lengths.max())
            powers = np.full(maxlen, base, dtype=np.uint64)
            powers[0] = np.uint64(1)
            powers = np.multiply.accumulate(powers)
            pos = np.arange(data.size, dtype=np.int64) - np.repeat(
                offs[:-1], lengths
            )
            terms = (data.astype(np.uint64) + np.uint64(1)) * powers[pos]
            csum = np.zeros(data.size + 1, dtype=np.uint64)
            np.cumsum(terms, out=csum[1:])
            sums = csum[offs[1:]] - csum[offs[:-1]]  # wraps mod 2^64: exact
        else:
            sums = np.zeros(n, dtype=np.uint64)
        return _mix64(sums + seed64 + lengths.astype(np.uint64) * _MIX1)


class BloomFilter:
    """Deterministic Bloom filter over strings: ``k`` probes by double
    hashing (``h1 + i·h2``) of two independently seeded
    :func:`stable_str_hash64` values (pure numpy — bit-identical across
    platforms and library versions, so driver ``add`` and worker
    ``contains`` always agree even on heterogeneous clusters).
    No false negatives by construction; false-positive rate ≈
    ``(1 − e^(−k·n/m))^k``.  The bit array is a numpy uint64 vector —
    a 2^27-bit filter is 16 MB however many grams went in, which is the
    point: it broadcasts at constant cost where the exact gram SET of a
    web-scale blocklist cannot."""

    def __init__(self, bits_pow: int = 20, k: int = 4):
        if not (3 <= bits_pow <= 40):
            raise ValueError(f"bits_pow out of range: {bits_pow}")
        self.bits_pow = bits_pow
        self.k = k
        self.mask = np.uint64((1 << bits_pow) - 1)
        self.bits = np.zeros(1 << max(0, bits_pow - 6), dtype=np.uint64)
        self.n_added = 0

    def _probes(self, arr: pa.Array) -> np.ndarray:
        """(len(arr), k) bit positions."""
        h1 = stable_str_hash64(arr, 0x51ED)
        h2 = stable_str_hash64(arr, 0xB10F) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            return ((h1[:, None] + i * h2[:, None]) & self.mask).astype(np.uint64)

    def add(self, arr) -> None:
        if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = pa.array(list(arr), pa.string())
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return
        pos = self._probes(arr).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))
        self.n_added += len(arr)

    def contains(self, arr) -> np.ndarray:
        """Vectorized membership: bool array (no false negatives)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._probes(arr)
        hit = (self.bits[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1)


def bloom_ngram_decontaminate(
    docs_ds,
    eval_texts: Sequence[str],
    *,
    n: int = 5,
    text_col: str = "text",
    bits_pow: int = 22,
    k: int = 4,
):
    """:func:`ngram_decontaminate`'s constant-memory scale path: the
    eval gram set loads into a :class:`BloomFilter` (16 MB at 2^27 bits
    regardless of blocklist size) that ships once via the task closure;
    membership is a vectorized k-probe bit test per batch.  No false
    negatives — everything the exact op drops, this drops — plus a
    bounded false-positive overdrop (tunable via ``bits_pow``/``k``),
    the standard trade for blocklists too large to broadcast as a set."""
    bf = BloomFilter(bits_pow=bits_pow, k=k)
    eval_grams: set = set()
    for t in eval_texts:
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            eval_grams.add(" ".join(toks[i : i + n]))
    bf.add(sorted(eval_grams))
    empty_ok = len(eval_grams) == 0

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or empty_ok:
            return batch
        grams, offs, valid = _word_ngrams(batch[text_col], n)
        if len(grams) == 0:
            return batch
        hit = bf.contains(grams) & valid
        starts = np.flatnonzero(hit)
        bad_rows = np.unique(np.searchsorted(offs, starts, side="right") - 1)
        keep = np.ones(batch.num_rows, dtype=bool)
        keep[bad_rows] = False
        return batch.filter(pa.array(keep))

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pack_bins(
    docs_ds,
    *,
    capacity: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    token_col: str = "n_tokens",
):
    """Greedy contiguous sequence packing: within each stratum, lay the
    documents out in ``key_col`` order and assign each to the
    fixed-capacity token bin in which it STARTS —
    ``bin = (prefix_sum - n_tokens) // capacity``, the deterministic
    packing a training-data pipeline uses to build fixed-length
    sequences.

    One ``groupby(stratum)`` exchange; per-group work is a sort + one
    vectorized cumulative sum (bounded by the stratum, like
    sessionize's per-user fold).  SQL twin: ``SUM(...) OVER (PARTITION
    BY stratum ORDER BY key ROWS UNBOUNDED PRECEDING)``."""
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            (strata_col, pa.string()),
            (token_col, pa.int64()),
            ("bin", pa.int64()),
        ]
    )

    def kernel(group: pa.Table) -> pa.Table:
        ids = np.asarray(
            pc.cast(group[key_col], pa.int64()).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        toks = np.asarray(
            pc.cast(group[token_col], pa.int64()).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        order = np.argsort(ids)
        cum = np.cumsum(toks[order])
        bins = (cum - toks[order]) // capacity
        return pa.table(
            {
                key_col: pa.array(ids[order], pa.int64()),
                strata_col: pc.cast(group[strata_col], pa.string()).take(
                    pa.array(order, pa.int64())
                ),
                token_col: pa.array(toks[order], pa.int64()),
                "bin": pa.array(bins, pa.int64()),
            }
        ).cast(out_schema)

    return docs_ds.groupby(strata_col).map_groups(kernel, batch_format="pyarrow")


# Deterministic mergeable quantile sketch (Munro & Paterson, "Selection
# and sorting with limited storage", TCS 1980): buffers of k sorted
# values per level, weight 2^level; two buffers at a level merge-sort
# and keep alternate elements, carrying to the next level.  Fully
# deterministic (no RNG — retry-stable like everything else here);
# rank error grows O(log^2(n/k)/k), tested empirically.


def _mp_push(levels: dict, level: int, buf: np.ndarray) -> None:
    """Push one sorted buffer; collapse pairwise while a level holds two."""
    while level in levels:
        other = levels.pop(level)
        merged = np.sort(np.concatenate([other, buf]), kind="mergesort")
        buf = merged[1::2]  # keep odd positions (deterministic MP choice)
        level += 1
    levels[level] = buf


def _mp_block_sketch(values: np.ndarray, k: int) -> dict:
    """Sketch of one block: feed k-sized sorted chunks through the
    collapse cascade; returns {level: sorted ndarray}."""
    levels: dict = {}
    v = np.sort(values, kind="mergesort")
    for off in range(0, v.size, k):
        chunk = v[off : off + k]
        if chunk.size == k:
            _mp_push(levels, 0, chunk)
        else:
            # undersized tail stays at level 0 weight by keeping it as
            # its own buffer at a sentinel "loose" level below collapse
            levels.setdefault(-1, np.zeros(0, dtype=v.dtype))
            levels[-1] = np.sort(
                np.concatenate([levels[-1], chunk]), kind="mergesort"
            )
            if levels[-1].size >= k:
                full = levels[-1]
                levels[-1] = full[k:]
                _mp_push(levels, 0, full[:k])
    return levels


class MPQuantileSketch:
    """Driver-side merged Munro-Paterson sketch with a quantile query.

    ``from_dataset`` reduces each block to (level, value) rows inside
    ``map_batches`` — O(k log(rows/k)) values leave each block no matter
    how big the block is, the same constant-state discipline as
    :func:`hll_distinct` — then merges the per-block buffers on the
    driver.  This is the documented scale path for
    :func:`quantile_threshold` / grouped quantiles when the value
    domain is unbounded or a key is too heavy to sort."""

    def __init__(self, k: int = 256):
        # buffers are always exactly k long when they collapse, so every
        # 2k-merge keeps k elements and total weight is preserved; an odd
        # k would let alternate-element selection drop mass
        if k < 2 or k % 2:
            raise ValueError("MPQuantileSketch requires an even k >= 2")
        self.k = k
        self.levels: dict = {}

    def merge_buffer(self, level: int, buf: np.ndarray) -> None:
        if level < 0:
            loose = self.levels.pop(-1, np.zeros(0, dtype=np.int64))
            loose = np.sort(np.concatenate([loose, buf]), kind="mergesort")
            while loose.size >= self.k:
                _mp_push(self.levels, 0, loose[: self.k])
                loose = loose[self.k :]
            if loose.size:
                self.levels[-1] = loose
            return
        _mp_push(self.levels, level, np.sort(buf, kind="mergesort"))

    def quantile(self, q: float) -> int:
        """Approximate ``quantile_disc``-style value at rank ceil(q*n)."""
        vals, wts = [], []
        for level, buf in self.levels.items():
            if buf.size == 0:
                continue
            vals.append(buf)
            wts.append(np.full(buf.size, 1 if level < 0 else 2**level, np.int64))
        if not vals:
            raise ValueError("empty sketch")
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="mergesort")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        n = int(cum[-1])
        idx = max(0, int(np.ceil(q * n)) - 1)
        return int(v[np.searchsorted(cum, idx, side="right")])

    @classmethod
    def from_dataset(cls, ds, col: str, *, k: int = 256) -> "MPQuantileSketch":
        def block(batch: pa.Table) -> pa.Table:
            ids = np.asarray(
                pc.cast(batch[col], pa.int64()).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            levels = _mp_block_sketch(ids, k)
            lv, vv = [], []
            for level, buf in levels.items():
                lv.extend([level] * buf.size)
                vv.extend(buf.tolist())
            return pa.table(
                {
                    "level": pa.array(lv, pa.int32()),
                    "value": pa.array(vv, pa.int64()),
                }
            )

        sk = cls(k=k)
        for b in ds.map_batches(
            block, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            if b.num_rows == 0 or b.num_columns == 0:
                continue
            sk.merge_level_rows(
                np.asarray(b["level"].to_numpy(zero_copy_only=False), np.int32),
                np.asarray(b["value"].to_numpy(zero_copy_only=False), np.int64),
            )
        return sk

    def merge_level_rows(self, lvl: np.ndarray, val: np.ndarray) -> None:
        """Merge serialized (level, value) sketch rows — the single
        place that understands the wire format per-block sketches and
        :func:`grouped_quantile_sketch` groups travel in."""
        for level in np.unique(lvl):
            self.merge_buffer(int(level), val[lvl == level])


def grouped_quantile_sketch(
    ds,
    *,
    key_col: str,
    value_col: str,
    qs: Sequence[float],
    out_names: Sequence[str],
    k: int = 256,
):
    """Approximate per-key quantiles via per-block Munro-Paterson
    partial sketches — the HEAVY-KEY scale path
    :func:`rify_ray.pipelines.relational.grouped_quantiles` documents:
    a key too large to sort in one worker never materializes; each
    block contributes O(k log(block/k)) (key, level, value) rows and
    the single ``groupby(key)`` exchange merges sketches, not values.

    Deterministic end to end (no RNG), so results are retry-stable;
    rank error matches :class:`MPQuantileSketch`."""
    qs = list(qs)
    names = list(out_names)

    def block(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(zero_copy_only=False)
        vals = np.asarray(
            pc.cast(batch[value_col], pa.int64()).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        out_k, out_l, out_v = [], [], []
        order = np.argsort(keys, kind="mergesort")
        keys_s, vals_s = keys[order], vals[order]
        bounds = np.flatnonzero(
            np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
        ).tolist() + [keys_s.size]
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            levels = _mp_block_sketch(vals_s[lo:hi], k)
            for level, buf in levels.items():
                out_k.extend([keys_s[lo]] * buf.size)
                out_l.extend([level] * buf.size)
                out_v.extend(buf.tolist())
        return pa.table(
            {
                key_col: pa.array(out_k, pa.string()),
                "level": pa.array(out_l, pa.int32()),
                "value": pa.array(out_v, pa.int64()),
            }
        )

    parts = ds.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)
    out_schema = pa.schema(
        [(key_col, pa.string())] + [(n, pa.int64()) for n in names]
    )

    def merge(group: pa.Table) -> pa.Table:
        sk = MPQuantileSketch(k=k)
        sk.merge_level_rows(
            np.asarray(group["level"].to_numpy(zero_copy_only=False), np.int32),
            np.asarray(group["value"].to_numpy(zero_copy_only=False), np.int64),
        )
        cols = {key_col: pa.array([group[key_col][0].as_py()], pa.string())}
        for q, name in zip(qs, names):
            cols[name] = pa.array([sk.quantile(q)], pa.int64())
        return pa.table(cols).cast(out_schema)

    return parts.groupby(key_col).map_groups(merge, batch_format="pyarrow")


def mixture_sample(
    docs_ds,
    rates: dict,
    *,
    default_pct: int = 0,
    mod: int = 100,
    key_col: str = "doc_id",
    strata_col: str = "source",
):
    """Deterministic mixture weighting: keep each row with a per-stratum
    rate (``rates[source]`` percent, ``default_pct`` for unlisted
    strata) — how a training mix up-/down-weights sources while staying
    retry-stable (same Knuth hash as :func:`stable_sample`, no RNG).

    The rate lookup is one vectorized ``index_in`` + ``take`` against
    the broadcast rates table per batch; the filter itself is the
    stable-sample kernel.  SQL twin: ``CASE source ... END`` threshold
    per row."""
    keys = sorted(rates)
    key_arr = pa.array(keys, pa.string())
    pct_arr = np.asarray([rates[s] for s in keys] + [default_pct], dtype=np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        h = _knuth_hash(batch, key_col)
        idx = pc.index_in(pc.cast(batch[strata_col], pa.string()), value_set=key_arr)
        idx_np = np.asarray(
            pc.fill_null(idx, len(keys)).to_numpy(zero_copy_only=False), dtype=np.int64
        )
        thresholds = pct_arr[idx_np]
        keep = h % mod < thresholds
        return batch.filter(pa.array(keep))

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
