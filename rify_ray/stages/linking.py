"""Mention detection + entity-link scoring on an actor pool.

The linker holds a shared alias dictionary (surface form → canonical
entity IRI) and a compiled relation-pattern regex.  Both are built ONCE
per actor in ``__init__`` — the dictionary arrives as a ``ray.put``
object ref so N actors share one object-store copy instead of N
serialized copies per task (broadcast small side, SURVEY.md §2.3).

Per batch, the compiled RE2/re scan runs per document (the regex engine
is C-level; this is the "batched model inference"-shaped stage), and the
emitted mentions are columnar.
"""

from __future__ import annotations

import re
from typing import Dict, List

import pyarrow as pa

MENTIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("s_surface", pa.string()),
        ("phrase", pa.string()),
        ("o_surface", pa.string()),
        ("s_entity", pa.string()),
        ("o_entity", pa.string()),
        ("score", pa.float32()),
    ]
)


class MentionExtractor:
    """Callable class for ``map_batches(..., concurrency=N)`` — one
    instance per actor (stateful stage, SURVEY.md §7.2)."""

    def __init__(self, alias_index, phrases: List[str]):
        import ray

        if isinstance(alias_index, ray.ObjectRef):
            alias_index = ray.get(alias_index)
        self.alias_index: Dict[str, str] = alias_index
        # alternation over alias surface shapes + the closed phrase set;
        # compiled once per actor
        surf = r"(?:Person \d+|P-\d+)"
        ph = "|".join(re.escape(p) for p in phrases)
        self.pattern = re.compile(rf"({surf}) ({ph}) ({surf})\.")

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        out: Dict[str, List] = {n: [] for n in MENTIONS_SCHEMA.names}
        idx = self.alias_index
        for url, text in zip(urls, texts):
            if not text:
                continue
            for m in self.pattern.finditer(text):
                ss, phrase, os_ = m.group(1), m.group(2), m.group(3)
                se = idx.get(ss)
                oe = idx.get(os_)
                if se is None or oe is None:
                    continue  # unlinkable surface form
                # exact primary form scores 1.0, alternate form 0.9
                score = (1.0 if ss.startswith("Person") else 0.9) * (
                    1.0 if os_.startswith("Person") else 0.9
                )
                out["url"].append(url)
                out["s_surface"].append(ss)
                out["phrase"].append(phrase)
                out["o_surface"].append(os_)
                out["s_entity"].append(se)
                out["o_entity"].append(oe)
                out["score"].append(score)
        return pa.table(
            {n: pa.array(out[n], MENTIONS_SCHEMA.field(n).type) for n in MENTIONS_SCHEMA.names}
        )


# per-worker-process cache for the task-based linker: the alias dict is
# fetched from the object store ONCE per process (not per batch) and the
# compiled extractor reused — broadcast-small-side without reserving CPU
# slots the way a fixed actor pool does (a fixed pool also blocks Ray's
# operator fusion, forcing the whole upstream chain through `concurrency`
# actors)
_LINKER_CACHE: dict = {}


def make_linker_fn(alias_ref, phrases: List[str]):
    phrases = list(phrases)

    def link_mentions(batch: pa.Table) -> pa.Table:
        key = getattr(alias_ref, "hex", lambda: str(id(alias_ref)))()
        state = _LINKER_CACHE.get(key)
        if state is None:
            state = MentionExtractor(alias_ref, phrases)
            _LINKER_CACHE[key] = state
        return state(batch)

    return link_mentions


def linking_stage(
    text_ds,
    alias_index,
    phrases: List[str],
    *,
    concurrency=None,
    batch_size: int = 512,
    num_cpus: float = 1,
    compute: str = "tasks",
):
    """text Dataset → mentions Dataset.

    ``compute="tasks"`` (default): stateless tasks with a per-process
    cached linker — fuses with neighboring map stages and uses every
    CPU.  ``compute="actors"``: classic fixed actor pool (the pattern
    for heavyweight model loads); note a fixed pool caps the fused
    chain's parallelism at ``concurrency``.

    ``alias_index`` may be a dict or a ``ray.put`` object ref
    (preferred: N workers share one object-store copy)."""
    if compute == "tasks":
        return text_ds.map_batches(
            make_linker_fn(alias_index, phrases),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    return text_ds.map_batches(
        MentionExtractor,
        fn_constructor_kwargs={"alias_index": alias_index, "phrases": phrases},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency or 4,
        num_cpus=num_cpus,
    )
