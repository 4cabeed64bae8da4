"""HTML → text extraction: stateless, vectorized, byte-deterministic.

Contract (BASELINE.json ``input_hint``): the extracted ``text`` must be
**byte-identical per url** across runs and parallelism levels.  The
extractor is a pure function of the ``html`` bytes built entirely from
Arrow compute kernels (RE2 regex), so block splits cannot change output.

Pipeline: drop <script>/<style> subtrees → strip tags → decode the
common HTML entities → collapse whitespace → trim.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# entity decode order matters: &amp; LAST so "&amp;lt;" decodes to "&lt;"
# (literal), never to "<" (double-decode)
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def extract_text_array(html: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Vectorized extraction over a binary/string column."""
    s = pc.cast(html, pa.string())
    # one fused pass for both subtree-dropping rules (RE2 alternation)
    s = pc.replace_substring_regex(
        s, r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>", " "
    )
    s = pc.replace_substring_regex(s, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        s = pc.replace_substring(s, ent, ch)
    s = pc.replace_substring_regex(s, r"\s+", " ")
    s = pc.utf8_trim_whitespace(s)
    return s


def extract_text(batch: pa.Table) -> pa.Table:
    """map_batches fn: pages batch → batch with ``text`` replaced by the
    extraction of ``html`` (keeps url/warc_ts/lang)."""
    text = extract_text_array(batch["html"])
    cols = {name: batch[name] for name in batch.column_names if name != "text" and name != "html"}
    cols["text"] = text
    return pa.table(cols)


def extract_stage(pages_ds, *, batch_size: int = 1024):
    """pages Dataset → (url, warc_ts, lang, text) Dataset.  Stateless
    task stage: no actor pool needed (SURVEY.md §7.2)."""
    return pages_ds.map_batches(
        extract_text,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
