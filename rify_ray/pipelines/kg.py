"""Knowledge-graph construction pipeline (BASELINE.json ``north_star``):

    pages (parquet / synthetic) → extract_text (stateless map_batches)
    → mention detection + entity linking (actor pool, shared alias dict)
    → canonicalize (vectorized dictionary lookup)
    → hash-partitioned dedup (groupby) → triples Dataset / parquet
    → distributed semi-naive fixpoint inference (rify_ray.engine)

Every stage streams blocks; the only materialization points are the
dedup shuffle and the fixpoint store.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import pyarrow as pa

from ..engine import Fixpoint, FixpointResult
from ..model import Rule
from ..sources.pages import PREDICATE_PHRASES, alias_index
from ..stages.canonicalize import DEFAULT_GRAPH, canonicalize_stage
from ..stages.extract import extract_stage
from ..stages.linking import linking_stage


def build_triples(
    pages_ds,
    alias_idx: Optional[Dict[str, str]] = None,
    phrase_to_pred: Optional[Dict[str, str]] = None,
    *,
    graph: Optional[str] = DEFAULT_GRAPH,
    concurrency: int = 4,
    linker_batch_size: int = 512,
    broadcast: bool = True,
    output_path: Optional[str] = None,
    num_output_partitions: int = 0,
    compute: str = "tasks",
):
    """pages Dataset → deduped canonical quads Dataset.

    ``broadcast=True`` puts the alias dictionary in the object store
    once (``ray.put``) so every linker actor reads a shared copy.
    ``output_path`` additionally writes partitioned parquet (resumable
    output layout: one directory of part files).
    """
    import ray

    phrase_to_pred = phrase_to_pred or dict(PREDICATE_PHRASES)
    if alias_idx is None:
        raise ValueError("alias_idx is required (use rify_ray.sources.alias_index(M))")
    phrases = list(phrase_to_pred.keys())
    idx_arg = ray.put(alias_idx) if broadcast else alias_idx

    text_ds = extract_stage(pages_ds)
    mentions = linking_stage(
        text_ds,
        idx_arg,
        phrases,
        concurrency=concurrency,
        batch_size=linker_batch_size,
        compute=compute,
    )
    quads = canonicalize_stage(mentions, phrase_to_pred, graph=graph)
    if quads is None:
        return None
    if output_path:
        to_write = quads
        if num_output_partitions:
            to_write = to_write.repartition(num_output_partitions)
        to_write.write_parquet(output_path)
        import ray.data

        quads = ray.data.read_parquet(output_path)
    return quads


def kg_construct_and_infer_store(
    pages_ds,
    rules: Sequence[Rule],
    m_entities: int,
    store_path: str,
    *,
    concurrency: int = 4,
    num_partitions: int = 32,
    salt_factor: int = 1,
    broadcast_rows: int = 500_000,
    with_lineage: bool = False,
):
    """Flagship pipeline on the 100 TB path: pages → triples →
    store-resident fixpoint.  The constructed quads stream from the
    linker straight into the :class:`TripleStore`'s generation-0 parquet
    and every inference round commits its delta as a new generation —
    triples never materialize on the driver (contrast
    :func:`kg_construct_and_infer`, the driver-resident variant kept for
    small interactive runs).  Returns the TripleStore;
    ``store.dataset(first_gen=1)`` is the derived closure.
    """
    import ray.data

    from ..engine import infer_store

    quads = build_triples(pages_ds, alias_index(m_entities), concurrency=concurrency)
    if quads is None:
        quads = ray.data.from_arrow(
            pa.schema([(c, pa.string()) for c in ["s", "p", "o", "g"]]).empty_table()
        )
    return infer_store(
        quads,
        rules,
        store_path,
        num_partitions=num_partitions,
        salt_factor=salt_factor,
        broadcast_rows=broadcast_rows,
        with_lineage=with_lineage,
        premises_precleaned=True,  # canonicalize_stage already dedups
    )


def kg_construct_and_infer(
    pages_ds,
    rules: Sequence[Rule],
    m_entities: int,
    *,
    concurrency: int = 4,
    checkpoint_dir: Optional[str] = None,
    mode: str = "auto",
    num_partitions: int = 32,
) -> FixpointResult:
    """Full flagship pipeline: construct the KG from pages, then run the
    distributed fixpoint under ``rules``.  Returns the FixpointResult
    (derived() gives the new triples with their iteration)."""
    import polars as pl

    quads = build_triples(pages_ds, alias_index(m_entities), concurrency=concurrency)
    if quads is None:
        premises = pl.DataFrame(schema={c: pl.Utf8 for c in ["s", "p", "o", "g"]})
    else:
        batches = list(quads.iter_batches(batch_size=None, batch_format="pyarrow"))
        premises = (
            pl.from_arrow(pa.concat_tables(batches))
            if batches
            else pl.DataFrame(schema={c: pl.Utf8 for c in ["s", "p", "o", "g"]})
        )
    fp = Fixpoint(
        rules, mode=mode, num_partitions=num_partitions, checkpoint_dir=checkpoint_dir
    )
    return fp.run(premises)
