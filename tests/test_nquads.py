"""N-Quads source/sink: parse fidelity, round-trips, engine e2e.

The term model is the reference's serde RDF-term JSON
(``/root/reference/src/rule.rs:486-570``); parsing maps each token to
that shape via the engine's canonical JSON string encoding, so a quad
loaded here is directly usable by infer/prove/query.
"""

import os

import pytest

import rify_ray
from rify_ray.engine import decode_term, encode_term
from rify_ray.sources import json_to_term, read_nquads, term_to_json, write_nquads

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


# ---------------------------------------------------------------------------
# token-level unit tests (no Ray)
# ---------------------------------------------------------------------------


def test_term_to_json_iri_blank():
    assert term_to_json("<http://ex.org/a>") == {"Iri": "http://ex.org/a"}
    assert term_to_json("_:b0") == {"Blank": "b0"}


def test_term_to_json_literals():
    assert term_to_json('"plain"') == {
        "Literal": {"value": "plain", "datatype": XSD_STRING}
    }
    assert term_to_json('"5"^^<http://www.w3.org/2001/XMLSchema#integer>') == {
        "Literal": {"value": "5", "datatype": "http://www.w3.org/2001/XMLSchema#integer"}
    }
    assert term_to_json('"chat"@fr-CA') == {
        "Literal": {"value": "chat", "datatype": LANG_STRING, "language": "fr-CA"}
    }


def test_literal_escapes_round_trip():
    for value in ['a"b', "a\\b", "line1\nline2", "tab\there", "héllo ✓"]:
        tok = json_to_term({"Literal": {"value": value, "datatype": XSD_STRING}})
        assert term_to_json(tok) == {"Literal": {"value": value, "datatype": XSD_STRING}}


def test_unicode_escape_parse():
    assert term_to_json('"\\u00e9\\U0001F600"') == {
        "Literal": {"value": "é😀", "datatype": XSD_STRING}
    }


def test_json_to_term_inverse():
    objs = [
        {"Iri": "http://ex.org/x"},
        {"Blank": "n1"},
        {"Literal": {"value": "v", "datatype": XSD_STRING}},
        {"Literal": {"value": "v", "datatype": "http://ex.org/dt"}},
        {"Literal": {"value": "v", "datatype": LANG_STRING, "language": "en"}},
    ]
    for obj in objs:
        assert term_to_json(json_to_term(obj)) == obj


def test_plain_string_policy():
    with pytest.raises(ValueError):
        json_to_term("c:123")
    assert json_to_term("c:123", plain_strings="iri") == "<c:123>"
    with pytest.raises(ValueError):
        json_to_term("DefaultGraph")


# ---------------------------------------------------------------------------
# dataset-level (Ray) tests
# ---------------------------------------------------------------------------

NQ_TEXT = """\
# a comment line
<http://ex.org/a> <http://ex.org/p> <http://ex.org/b> .

<http://ex.org/b> <http://ex.org/p> "lit with \\"quote\\" and \\n newline"@en <http://ex.org/g1> .
_:blank <http://ex.org/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
"""


def _write(tmp_path, text, name="in.nq"):
    f = tmp_path / name
    f.write_text(text, encoding="utf-8")
    return str(f)


def test_read_nquads_basic(ray_session, tmp_path):
    ds = read_nquads(_write(tmp_path, NQ_TEXT))
    rows = sorted(
        tuple(r[c] for c in ("s", "p", "o", "g")) for r in ds.take_all()
    )
    assert len(rows) == 3
    decoded = [tuple(decode_term(t) for t in r) for r in rows]
    assert (
        {"Iri": "http://ex.org/a"},
        {"Iri": "http://ex.org/p"},
        {"Iri": "http://ex.org/b"},
        "DefaultGraph",
    ) in decoded
    lit = next(d for d in decoded if d[0] == {"Blank": "blank"})
    assert lit[2] == {
        "Literal": {"value": "42", "datatype": "http://www.w3.org/2001/XMLSchema#integer"}
    }
    langlit = next(d for d in decoded if isinstance(d[3], dict))
    assert langlit[2] == {
        "Literal": {
            "value": 'lit with "quote" and \n newline',
            "datatype": LANG_STRING,
            "language": "en",
        }
    }
    assert langlit[3] == {"Iri": "http://ex.org/g1"}


def test_read_nquads_malformed(ray_session, tmp_path):
    bad = "<http://ex.org/a> <http://ex.org/p> .\n"
    path = _write(tmp_path, NQ_TEXT + bad)
    with pytest.raises(Exception):
        read_nquads(path).take_all()
    ok = read_nquads(path, on_error="skip").take_all()
    assert len(ok) == 3


def test_write_read_round_trip(ray_session, tmp_path):
    import ray.data

    quads = [
        (
            {"Iri": "http://ex.org/s"},
            {"Iri": "http://ex.org/p"},
            {"Literal": {"value": 'v"\\\n', "datatype": XSD_STRING}},
            "DefaultGraph",
        ),
        (
            {"Blank": "x"},
            {"Iri": "http://ex.org/p"},
            {"Literal": {"value": "bonjour", "datatype": LANG_STRING, "language": "fr"}},
            {"Iri": "http://ex.org/g"},
        ),
    ]
    import pyarrow as pa

    tbl = pa.table(
        {
            c: pa.array([encode_term(q[j]) for q in quads], pa.string())
            for j, c in enumerate(("s", "p", "o", "g"))
        }
    )
    out = str(tmp_path / "out")
    n = write_nquads(ray.data.from_arrow(tbl), out)
    assert n == 2
    back = read_nquads(out)
    rows = {
        tuple(r[c] for c in ("s", "p", "o", "g")) for r in back.take_all()
    }
    want = {tuple(encode_term(t) for t in q) for q in quads}
    assert rows == want


def test_nquads_into_infer(ray_session, tmp_path):
    """Loaded quads flow straight into the distributed engine."""
    text = (
        "<http://ex.org/a> <http://ex.org/parent> <http://ex.org/b> .\n"
        "<http://ex.org/b> <http://ex.org/parent> <http://ex.org/c> .\n"
    )
    ds = read_nquads(_write(tmp_path, text))
    P = encode_term({"Iri": "http://ex.org/parent"})
    A = encode_term({"Iri": "http://ex.org/anc"})
    G = encode_term("DefaultGraph")
    from rify_ray import B, Rule, U

    rules = [
        Rule.create(
            [(U("x"), B(P), U("y"), B(G))], [(U("x"), B(A), U("y"), B(G))]
        ),
        Rule.create(
            [(U("x"), B(A), U("y"), B(G)), (U("y"), B(A), U("z"), B(G))],
            [(U("x"), B(A), U("z"), B(G))],
        ),
    ]
    out = rify_ray.infer(ds, rules)
    derived = {tuple(r) for r in out.select(["s", "p", "o", "g"]).iter_rows()}
    a, b, c = (encode_term({"Iri": f"http://ex.org/{x}"}) for x in "abc")
    assert derived == {(a, A, b, G), (b, A, c, G), (a, A, c, G)}


def test_write_plain_strings(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    tbl = pa.table(
        {c: pa.array(["c:1"], pa.string()) for c in ("s", "p", "o")}
        | {"g": pa.array([encode_term("DefaultGraph")], pa.string())}
    )
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(Exception):
        write_nquads(ds, str(tmp_path / "fail"))
    out = str(tmp_path / "ok")
    assert write_nquads(ds, out, plain_strings="iri") == 1
    (row,) = read_nquads(out).take_all()
    assert decode_term(row["s"]) == {"Iri": "c:1"}


def test_read_nquads_bad_escapes(ray_session, tmp_path):
    """Lines that pass the line regex but hold an invalid or truncated
    escape honor on_error: skip drops them, error raises with context."""
    bad = (
        '<http://ex.org/a> <http://ex.org/p> "bad \\q escape" .\n'
        '<http://ex.org/a> <http://ex.org/p> "cut \\u00" .\n'
        '<http://ex.org/a> <http://ex.org/p> "bad hex \\uZZZZ" .\n'
    )
    path = _write(tmp_path, NQ_TEXT + bad)
    with pytest.raises(Exception, match="malformed N-Quads line"):
        read_nquads(path).take_all()
    ok = read_nquads(path, on_error="skip").take_all()
    assert len(ok) == 3


def test_write_nquads_rerun_clears_stale_parts(ray_session, tmp_path):
    """A rerun that produces fewer batches must not leave stale part
    files from the previous run (phantom quads on read-back)."""
    import ray.data

    from rify_ray.sources.nquads import write_nquads

    d = str(tmp_path / "out")

    def quads(n):
        import pyarrow as pa

        from rify_ray.engine import encode_term

        iri = lambda x: encode_term({"Iri": f"http://ex.org/{x}"})  # noqa: E731
        return ray.data.from_arrow(
            pa.table(
                {
                    "s": pa.array([iri(f"s{i}") for i in range(n)]),
                    "p": pa.array([iri("p")] * n),
                    "o": pa.array([iri(f"o{i}") for i in range(n)]),
                    "g": pa.array([encode_term("DefaultGraph")] * n),
                }
            )
        )

    # first run: many small parts
    big = quads(300_000)
    assert write_nquads(big, d) == 300_000
    n_parts_before = sum(1 for x in os.listdir(d) if x.endswith(".nq"))
    assert n_parts_before > 1
    # rerun with a tiny dataset: old parts must vanish
    assert write_nquads(quads(3), d) == 3
    assert sum(1 for x in os.listdir(d) if x.endswith(".nq")) == 1
    assert read_nquads(d).count() == 3
    assert not any(x.endswith(".tmp") for x in os.listdir(d))
