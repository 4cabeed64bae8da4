"""Deterministic synthetic Common-Crawl-style web pages.

Schema is exactly BASELINE.json ``input_hint``::

    url:     string      -- unique key "https://ex.org/p/{i}"
    warc_ts: timestamp[us]
    html:    binary      -- template-rendered page embedding entity mentions
    text:    string      -- golden extraction output (byte-identity check)
    lang:    string      -- "en" mostly, deterministic "de"/"fr" sprinkle

Every page embeds a known set of (subject, predicate-phrase, object)
mentions drawn from a closed alias dictionary, so each page has a known
expected triple set (FIXTURES.md §F1) and the KG pipeline's output has a
closed-form oracle:

- page ``i`` asserts ``person_{i % M}  is the parent of  person_{(i+1) % M}``
  → the parent graph over M entities is a ring → the ancestor closure is
  exactly the M² ordered pairs (same shape as the reference's ancestry
  golden case, ``/root/reference/src/infer.rs:116-154``).
- page ``i`` also asserts a ``works with`` filler relation and one
  distractor sentence with no relations.

Generation is a pure function of the row index — no RNG state, no wall
clock — so any parallelism / block split yields identical bytes.
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

import pyarrow as pa

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# closed predicate-phrase dictionary: surface phrase -> canonical predicate
PREDICATE_PHRASES: Dict[str, str] = {
    "is the parent of": "parent",
    "works with": "works_with",
}

_LANGS = ["de", "fr"]


def entity_iri(k: int) -> str:
    return f"ent:person_{k}"


def surface_form(k: int, variant: int) -> str:
    """Two alias surface forms per entity; the linker must map both."""
    return f"Person {k}" if variant == 0 else f"P-{k}"


def alias_index(m: int) -> Dict[str, str]:
    """Alias dictionary: surface form -> canonical entity IRI.  This is
    the shared lookup loaded once per linker actor."""
    out: Dict[str, str] = {}
    for k in range(m):
        out[surface_form(k, 0)] = entity_iri(k)
        out[surface_form(k, 1)] = entity_iri(k)
    return out


# default dictionary used by tests/bench (big enough for any M <= 100k
# is wasteful to prebuild: callers use alias_index(M))
ALIAS_INDEX = alias_index


_FILLER_WORDS = (
    "market weather harbor signal garden window stream meadow copper lantern "
    "quarry timber ledger anchor willow saddle furnace compass orchard mill"
).split()


N_FILLER = 26  # constant per page → fully vectorizable generation


def _filler_sentence(i: int, j: int) -> str:
    """Deterministic 12-word distractor sentence (no relations)."""
    w = _FILLER_WORDS
    n = len(w)
    words = [w[(i * 31 + j * 17 + k * 7) % n] for k in range(12)]
    return f"On day {i} the " + " ".join(words) + " was noted."


def _page_parts(i: int, m: int) -> Tuple[str, str, str, List[Tuple[str, str, str]]]:
    """(title, sentences, distractor, triples) for page i over m entities.

    Pages carry Common-Crawl-like bulk: a handful of relation sentences
    buried in dozens of filler sentences, so extraction and linking do
    realistic per-page work.
    """
    a = i % m
    b = (i + 1) % m
    c = (i * 7 + 3) % m
    # alternate surface forms deterministically to exercise the alias dict
    sa = surface_form(a, i % 2)
    sb = surface_form(b, (i // 2) % 2)
    sc = surface_form(c, (i // 3) % 2)
    s1 = f"{sa} is the parent of {sb}."
    s2 = f"{sa} works with {sc}."
    distractor = f"The weather on day {i} was mild and the market closed early."
    fillers = [_filler_sentence(i, j) for j in range(N_FILLER)]
    sentences = [s1, *fillers[: N_FILLER // 2], s2, *fillers[N_FILLER // 2 :], distractor]
    triples = [
        (entity_iri(a), "parent", entity_iri(b)),
        (entity_iri(a), "works_with", entity_iri(c)),
    ]
    return f"Page {i}", sentences, distractor, triples


def _lang(i: int) -> str:
    if i % 17 == 0:
        return "de"
    if i % 23 == 0:
        return "fr"
    return "en"


def render_page(i: int, m: int) -> Tuple[str, int, bytes, str, str]:
    """One page row.  The golden ``text`` is constructed to be exactly
    what :func:`rify_ray.stages.extract.extract_text` produces from
    ``html`` (single-space separated, entities decoded)."""
    title, sentences, _, _ = _page_parts(i, m)
    body_html = "".join(f"<p>{s}</p>" for s in sentences)
    html = (
        f"<html><head><title>{title}</title>"
        f"<style>body{{color:#000;margin:0}}</style>"
        f"<script>var i={i};console.log(i&amp;&amp;1);</script></head>"
        f"<body><h1>{title}</h1>{body_html}"
        f"<div>footer &amp; links</div></body></html>"
    )
    text = " ".join([title, title, *sentences, "footer & links"])
    return (
        f"https://ex.org/p/{i}",
        EPOCH_US + i * 1_000_000,
        html.encode("utf-8"),
        text,
        _lang(i),
    )


def pages_batch(indices, m: int, include_golden: bool = True) -> pa.Table:
    """Vector of pages for a batch of row indices — fully vectorized
    Arrow string assembly (byte-identical to :func:`render_page`, which
    stays as the scalar reference pinned by tests).

    ``include_golden=False`` skips the golden ``text`` column (emits
    empty strings) — for benchmark inputs where extraction recomputes it
    anyway, halving generated bytes."""
    import numpy as np
    import pyarrow.compute as pc

    i = np.asarray(list(indices), dtype=np.int64)
    n = i.size
    if n == 0:
        return PAGES_SCHEMA.empty_table()

    def nadd(*parts):
        """Single-pass Arrow concat: parts are pa arrays or str scalars."""
        return pc.binary_join_element_wise(*parts, "")

    def istr(arr) -> pa.Array:
        return pc.cast(pa.array(arr), pa.string())

    i_str = istr(i)
    a = i % m
    b = (i + 1) % m
    c = (i * 7 + 3) % m

    def surf(k_arr, variant_flags):
        ks = istr(k_arr)
        return pc.if_else(
            pa.array(variant_flags == 0), nadd("Person ", ks), nadd("P-", ks)
        )

    sa = surf(a, i % 2)
    sb = surf(b, (i // 2) % 2)
    sc = surf(c, (i // 3) % 2)
    s1 = nadd(sa, " is the parent of ", sb, ".")
    s2 = nadd(sa, " works with ", sc, ".")
    distractor = nadd("The weather on day ", i_str, " was mild and the market closed early.")

    # fillers: "On day {i} the w0 ... w11 was noted."
    w_arr = pa.array(_FILLER_WORDS, pa.string())
    nw = len(_FILLER_WORDS)
    fillers = []
    for j in range(N_FILLER):
        parts = ["On day ", i_str, " the "]
        for k in range(12):
            parts.append(pc.take(w_arr, pa.array((i * 31 + j * 17 + k * 7) % nw)))
            if k < 11:
                parts.append(" ")
        parts.append(" was noted.")
        fillers.append(nadd(*parts))

    title = nadd("Page ", i_str)
    sentences = [s1, *fillers[: N_FILLER // 2], s2, *fillers[N_FILLER // 2 :], distractor]

    if include_golden:
        text_parts = [title, " ", title]
        for s in sentences:
            text_parts.extend((" ", s))
        text_parts.extend((" ", "footer & links"))
        text = nadd(*text_parts)
    else:
        text = pa.array([""] * n, pa.string())

    html_parts = [
        "<html><head><title>", title, "</title>",
        "<style>body{color:#000;margin:0}</style>",
        "<script>var i=", i_str, ";console.log(i&amp;&amp;1);</script></head>",
        "<body><h1>", title, "</h1>",
    ]
    for s in sentences:
        html_parts.extend(("<p>", s, "</p>"))
    html_parts.append("<div>footer &amp; links</div></body></html>")
    html = nadd(*html_parts)

    langs = pc.if_else(
        pa.array(i % 17 == 0),
        pa.scalar("de", pa.string()),
        pc.if_else(pa.array(i % 23 == 0), pa.scalar("fr", pa.string()), pa.scalar("en", pa.string())),
    )
    urls = nadd("https://ex.org/p/", i_str)

    return pa.table(
        {
            "url": urls,
            "warc_ts": pa.array(EPOCH_US + i * 1_000_000, pa.timestamp("us")),
            "html": html.cast(pa.binary()),
            "text": text,
            "lang": langs,
        }
    )


def pages_table(n_pages: int, m_entities: int | None = None) -> pa.Table:
    """Driver-side (small) pages table for tests."""
    m = m_entities or max(4, min(1000, n_pages))
    return pages_batch(range(n_pages), m)


def pages_dataset(
    n_pages: int,
    m_entities: int | None = None,
    *,
    override_num_blocks: int | None = None,
    include_golden: bool = True,
):
    """Distributed pages source: ``ray.data.range`` → ``map_batches`` of
    the pure page renderer.  At real scale this is replaced by
    ``ray.data.read_parquet(..., columns=[...])`` over WARC-derived
    parquet; the renderer stands in for that input deterministically."""
    import ray.data

    m = m_entities or max(4, min(1000, n_pages))
    ds = ray.data.range(n_pages, override_num_blocks=override_num_blocks)

    def build(batch: pa.Table) -> pa.Table:
        return pages_batch(batch["id"].to_pylist(), m, include_golden)

    return ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)


def write_pages_parquet(
    path: str,
    n_pages: int,
    m_entities: int | None = None,
    *,
    override_num_blocks: int | None = None,
    include_golden: bool = True,
) -> None:
    """Persist a synthetic page corpus as the canonical input layout: a
    partitioned Parquet directory with the Common-Crawl-style schema
    ``(url, warc_ts, html, [text,] lang)``."""
    pages_dataset(
        n_pages,
        m_entities,
        override_num_blocks=override_num_blocks,
        include_golden=include_golden,
    ).write_parquet(path)


def read_pages(path: str, *, columns: List[str] | None = None):
    """Streaming source over a Parquet pages table — the real-input
    entry point (BASELINE.json ``input_hint``).  Validates the schema
    before any compute so a malformed corpus fails fast; pass
    ``columns`` to prune at the read (only needed columns leave
    storage).  The result feeds :func:`rify_ray.pipelines.kg.build_triples`
    exactly like the synthetic source."""
    import ray.data

    ds = ray.data.read_parquet(path, columns=columns)
    schema = ds.schema()
    required = {"url": pa.string(), "warc_ts": pa.timestamp("us"), "html": pa.binary()}
    names = set(schema.names)
    for col, typ in required.items():
        if columns is not None and col not in columns:
            continue
        if col not in names:
            raise ValueError(f"pages parquet at {path!r} lacks required column {col!r}")
        got = schema.base_schema.field(col).type
        if got != typ:
            raise ValueError(
                f"pages column {col!r} must be {typ}, found {got} at {path!r}"
            )
    return ds


def expected_page_triples(n_pages: int, m_entities: int | None = None) -> Set[Tuple[str, str, str]]:
    """Closed-form union of per-page known triples (dedup'd)."""
    m = m_entities or max(4, min(1000, n_pages))
    out: Set[Tuple[str, str, str]] = set()
    for i in range(n_pages):
        _, _, _, triples = _page_parts(i, m)
        out.update(triples)
    return out
