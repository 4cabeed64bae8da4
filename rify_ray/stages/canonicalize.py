"""Triple canonicalization: mentions → normalized (s, p, o, g) quads.

Maps predicate phrases to canonical predicates with a vectorized
dictionary lookup (``index_in`` + ``take`` — no Python row loop), sets
the graph term to the page url (provenance) or a fixed default graph,
and hash-dedups via groupby (SURVEY.md §2.3 "Triple canonicalization").
"""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..util import distinct

QUAD_SCHEMA = pa.schema(
    [("s", pa.string()), ("p", pa.string()), ("o", pa.string()), ("g", pa.string())]
)

DEFAULT_GRAPH = "default_graph"


def canonicalize_fn(phrase_to_pred: Dict[str, str], graph: Optional[str] = DEFAULT_GRAPH):
    """Build the map_batches fn.  ``graph=None`` keeps per-page
    provenance (g = url); a string pins all quads to that graph."""
    keys = pa.array(list(phrase_to_pred.keys()), pa.string())
    vals = pa.array(list(phrase_to_pred.values()), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch["phrase"], value_set=keys)
        pred = pc.take(vals, idx)
        g = batch["url"] if graph is None else pa.array([graph] * batch.num_rows, pa.string())
        return pa.table(
            {
                "s": pc.cast(batch["s_entity"], pa.string()),
                "p": pc.cast(pred, pa.string()),
                "o": pc.cast(batch["o_entity"], pa.string()),
                "g": g,
            }
        )

    return fn


def canonicalize_stage(
    mentions_ds,
    phrase_to_pred: Dict[str, str],
    *,
    graph: Optional[str] = DEFAULT_GRAPH,
    dedup: bool = True,
    batch_size: int = 4096,
):
    """mentions Dataset → deduped quads Dataset.  Dedup is a
    hash-partition groupby on (s,p,o,g) — the distributed
    insert-if-absent (``Reasoner::insert``, src/reasoner.rs:103-127).
    Returns None when there are no mentions at all."""
    quads = mentions_ds.map_batches(
        canonicalize_fn(phrase_to_pred, graph),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    if not dedup:
        return quads
    return distinct(quads, ["s", "p", "o", "g"])
