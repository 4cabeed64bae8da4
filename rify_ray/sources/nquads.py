"""N-Quads interchange: read/write RDF quad text files as quad Datasets.

The reference is an RDF-adjacent reasoning library whose JS bindings
take quads of serde RDF-term objects (``Blank(String) | Iri(String) |
Literal { value, datatype, language: Option } | DefaultGraph``,
``/root/reference/src/rule.rs:486-570``); its users hold RDF data.
This module maps the W3C N-Quads line format onto that exact term
model, via the engine's canonical JSON string encoding
(:func:`rify_ray.engine.encode_term`), so quads loaded here flow
straight into :func:`rify_ray.engine.infer` / :func:`infer_store` /
:func:`query` and round-trip back out byte-stably.

Scale shape: the reader is ``read_text`` → one ``map_batches`` parse
stage (the line-classifying regex is RE2 via ``pc.extract_regex``, the
per-term conversion is bounded Python — a parser, not a hot kernel);
the writer shards via ``map_batches`` → per-block text files under a
directory, so neither direction funnels through the driver.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
_LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

# one RE2-compatible line regex: subject, predicate, object, optional graph
_IRI = r"<[^<>\"{}|^`\\\x00-\x20]*>"
_BLANK = r"_:[A-Za-z0-9][A-Za-z0-9._-]*"
_LIT = r'"(?:[^"\\\n\r]|\\.)*"(?:\^\^' + _IRI + r"|@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)?"
LINE_RE = (
    rf"^[ \t]*(?P<s>{_IRI}|{_BLANK})[ \t]+(?P<p>{_IRI})[ \t]+"
    rf"(?P<o>{_IRI}|{_BLANK}|{_LIT})"
    rf"(?:[ \t]+(?P<g>{_IRI}|{_BLANK}))?[ \t]*\.[ \t]*$"
)
_LINE_PY = re.compile(LINE_RE)
_LIT_PY = re.compile(
    r'^"(?P<value>(?:[^"\\\n\r]|\\.)*)"(?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[a-zA-Z]+(?:-[a-zA-Z0-9]+)*))?$'
)

_UNESCAPE = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError(f"truncated escape at end of literal: {s!r}")
        e = s[i + 1]
        if e in ("u", "U"):
            width = 4 if e == "u" else 8
            hexpart = s[i + 2 : i + 2 + width]
            if len(hexpart) < width:
                raise ValueError(f"truncated \\{e} escape in literal: {s!r}")
            try:
                out.append(chr(int(hexpart, 16)))
            except (ValueError, OverflowError) as exc:
                raise ValueError(f"invalid \\{e} escape {hexpart!r} in literal: {s!r}") from exc
            i += 2 + width
        else:
            if e not in _UNESCAPE:
                raise ValueError(f"invalid escape \\{e} in literal: {s!r}")
            out.append(_UNESCAPE[e])
            i += 2
    return "".join(out)


def _escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def term_to_json(tok: str):
    """One N-Quads term token → the reference's serde RDF-term JSON."""
    if tok.startswith("<"):
        return {"Iri": tok[1:-1]}
    if tok.startswith("_:"):
        return {"Blank": tok[2:]}
    m = _LIT_PY.match(tok)
    if m is None:
        raise ValueError(f"unparseable N-Quads term: {tok!r}")
    value = _unescape(m.group("value"))
    lang = m.group("lang")
    lit = {"value": value}
    if lang:
        lit["datatype"] = _LANG_STRING
        lit["language"] = lang
    else:
        lit["datatype"] = m.group("dt") or _XSD_STRING
    return {"Literal": lit}


def json_to_term(obj, *, plain_strings: str = "error") -> str:
    """Serde RDF-term JSON → one N-Quads term token (inverse of
    :func:`term_to_json`).  A PLAIN string term (the engine's opaque
    default, e.g. ``"c:123"``) has no faithful N-Quads form:
    ``plain_strings="iri"`` writes it as an IRI (reading back yields
    ``{"Iri": ...}``, documented lossy), ``"error"`` (default) raises."""
    if obj == "DefaultGraph":
        raise ValueError("DefaultGraph has no token; omit the graph slot")
    if isinstance(obj, str):
        if plain_strings == "iri":
            return f"<{obj}>"
        raise ValueError(
            f"plain-string term {obj!r} is not an RDF-term object; "
            "pass plain_strings='iri' to serialize it as an IRI"
        )
    if not isinstance(obj, dict) or len(obj) != 1:
        raise ValueError(f"not an RDF-term object: {obj!r}")
    (kind, v), = obj.items()
    if kind == "Iri":
        return f"<{v}>"
    if kind == "Blank":
        return f"_:{v}"
    if kind == "Literal":
        s = f'"{_escape(v["value"])}"'
        lang = v.get("language")
        dt = v.get("datatype", _XSD_STRING)
        if lang:
            return f"{s}@{lang}"
        if dt and dt != _XSD_STRING:
            return f"{s}^^<{dt}>"
        return s
    raise ValueError(f"not an RDF-term object: {obj!r}")


def _parse_batch_fn(on_error: str):
    from ..engine import encode_term

    def fn(batch: pa.Table) -> pa.Table:
        lines = batch["text"]
        # RE2 line classification first (vectorized); rows that do not
        # match are blank/comment/malformed and resolve per on_error
        ext = pc.extract_regex(pc.cast(lines, pa.string()), pattern=LINE_RE)
        cols = {c: [] for c in ("s", "p", "o", "g")}
        for i in range(len(lines)):
            raw = lines[i].as_py()
            if raw is None or not raw.strip() or raw.lstrip().startswith("#"):
                continue
            row = ext[i].as_py()
            if row is None or row.get("s") is None:
                if on_error == "skip":
                    continue
                raise ValueError(f"malformed N-Quads line: {raw!r}")
            toks = (row["s"], row["p"], row["o"], row.get("g"))
            try:
                vals = [
                    "DefaultGraph"
                    if (c == "g" and (tok is None or tok == ""))
                    else encode_term(term_to_json(tok))
                    for c, tok in zip(("s", "p", "o", "g"), toks)
                ]
            except ValueError:
                # a line can pass the RE2 shape check yet hold an invalid
                # or truncated escape — on_error="skip" drops those too
                if on_error == "skip":
                    continue
                raise ValueError(f"malformed N-Quads line: {raw!r}")
            for c, v in zip(("s", "p", "o", "g"), vals):
                cols[c].append(v)
        return pa.table({c: pa.array(cols[c], pa.string()) for c in ("s", "p", "o", "g")})

    return fn


def read_nquads(path, *, on_error: str = "error", **read_kwargs):
    """N-Quads file(s)/dir → quad Dataset (columns s,p,o,g; terms are
    the engine's canonical JSON-encoded RDF-term strings, graph slot
    ``"DefaultGraph"`` for triple-form lines).  ``on_error="skip"``
    drops malformed lines instead of raising."""
    import ray.data

    ds = ray.data.read_text(path, **read_kwargs)
    return ds.map_batches(
        _parse_batch_fn(on_error), batch_format="pyarrow", zero_copy_batch=True
    )


def _format_batch_fn(plain_strings: str):
    from ..engine import decode_term

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            s, p, o, g = (batch[c][i].as_py() for c in ("s", "p", "o", "g"))
            toks = [
                json_to_term(decode_term(t), plain_strings=plain_strings)
                for t in (s, p, o)
            ]
            gd = decode_term(g)
            if gd != "DefaultGraph":
                toks.append(json_to_term(gd, plain_strings=plain_strings))
            out.append(" ".join(toks) + " .")
        return pa.table({"line": pa.array(out, pa.string())})

    return fn


def write_nquads(quads_ds, path: str, *, plain_strings: str = "error") -> int:
    """Quad Dataset → N-Quads part files under directory ``path``.
    Formatting runs distributed; the driver STREAMS formatted batches to
    disk (bounded memory, never the whole set at once).  N-Quads is the
    interchange sink — bulk quad output at scale should use
    :func:`rify_ray.sinks.write_partitioned_parquet` or the store's
    parquet generations.  Returns the number of quads written."""
    import os

    import ray

    os.makedirs(path, exist_ok=True)
    # materialize the formatted lines BEFORE clearing prior part files:
    # an in-place rewrite (read_nquads(p) → write_nquads(..., p)) would
    # otherwise delete its own lazy input's files before the read runs.
    # Clearing is still required — a rerun producing fewer batches would
    # leave stale parts behind, and a later directory read would see
    # duplicate/phantom quads
    lines = quads_ds.map_batches(
        _format_batch_fn(plain_strings), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    for n in os.listdir(path):
        if n.endswith(".nq") or n.endswith(".nq.tmp"):
            os.remove(os.path.join(path, n))

    total = 0
    for i, batch in enumerate(
        lines.iter_batches(batch_size=65536, batch_format="pyarrow")
    ):
        if batch.num_rows == 0:
            continue
        part = os.path.join(path, f"part-{i:05d}.nq")
        # tmp + rename: a crashed write never leaves a half-written .nq
        with open(part + ".tmp", "w", encoding="utf-8") as f:
            f.write("\n".join(batch["line"].to_pylist()))
            f.write("\n")
        os.replace(part + ".tmp", part)
        total += batch.num_rows
    return total
