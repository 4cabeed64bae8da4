"""JSONL corpus interchange: round-trip fidelity, schema pinning,
malformed-line policy, rerun part-file hygiene."""

import json
import os

import pyarrow as pa
import pytest

SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text", pa.string()), ("tag", pa.string())]
)

ROWS = [
    {"doc_id": 0, "text": "plain", "tag": "a"},
    {"doc_id": 1, "text": 'quotes " and \\ backslash', "tag": "b"},
    {"doc_id": 2, "text": "unicode é中文 \U0001f600", "tag": "c"},
    {"doc_id": 3, "text": "tab\tand\nnewline", "tag": "a"},
    # U+2028/U+2029: legal RAW inside JSON strings — a writer that
    # splits parts with str.splitlines() would corrupt this record
    {"doc_id": 4, "text": "line and separators", "tag": "b"},
]


def _table():
    return pa.table(
        {k: pa.array([r[k] for r in ROWS], SCHEMA.field(k).type) for k in SCHEMA.names}
    )


def _collect(ds):
    tabs = [
        b
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    return pa.concat_tables(tabs) if tabs else None


def test_write_read_roundtrip(ray_session, tmp_path):
    import ray.data

    from rify_ray.sources import read_jsonl, write_jsonl

    ds = ray.data.from_arrow(_table()).repartition(2)
    n = write_jsonl(ds, str(tmp_path / "out"))
    assert n == len(ROWS)
    back = _collect(read_jsonl(str(tmp_path / "out"), schema=SCHEMA))
    got = sorted(back.to_pylist(), key=lambda r: r["doc_id"])
    assert got == ROWS


def test_read_without_schema_infers(ray_session, tmp_path):
    from rify_ray.sources import read_jsonl

    p = tmp_path / "a.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in ROWS) + "\n")
    back = _collect(read_jsonl(str(p)))
    assert sorted(back.to_pylist(), key=lambda r: r["doc_id"]) == ROWS


def test_on_error_skip_drops_bad_lines(ray_session, tmp_path):
    from rify_ray.sources import read_jsonl

    p = tmp_path / "bad.jsonl"
    lines = [json.dumps(ROWS[0]), "{not json", json.dumps(ROWS[1]), '"a bare string"', ""]
    p.write_text("\n".join(lines) + "\n")
    back = _collect(read_jsonl(str(p), schema=SCHEMA, on_error="skip"))
    assert back.num_rows == 2
    with pytest.raises(Exception):
        _collect(read_jsonl(str(p), schema=SCHEMA))  # strict mode raises
    with pytest.raises(ValueError):
        read_jsonl(str(p), on_error="nope")


def test_rerun_clears_stale_parts(ray_session, tmp_path):
    import ray.data

    from rify_ray.sources import read_jsonl, write_jsonl

    out = str(tmp_path / "out")
    big = pa.table(
        {
            "doc_id": pa.array(range(200_000), pa.int64()),
            "text": pa.array(["x"] * 200_000, pa.string()),
            "tag": pa.array(["t"] * 200_000, pa.string()),
        }
    )
    write_jsonl(ray.data.from_arrow(big), out)
    first_parts = sorted(os.listdir(out))
    assert len(first_parts) > 1
    # rerun with fewer rows must not leave stale parts behind
    write_jsonl(ray.data.from_arrow(_table()), out)
    back = _collect(read_jsonl(out, schema=SCHEMA))
    assert back.num_rows == len(ROWS)


def test_in_place_rewrite_preserves_data(ray_session, tmp_path):
    """write_jsonl(read_jsonl(p), p) must not destroy its own lazy
    input — the formatted lines materialize before parts are cleared."""
    import json as _json

    from rify_ray.sources import read_jsonl, write_jsonl

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in ROWS) + "\n", encoding="utf-8"
    )
    ds = read_jsonl(str(p), schema=SCHEMA)
    n = write_jsonl(ds, str(p))
    assert n == len(ROWS)
    back = _collect(read_jsonl(str(p), schema=SCHEMA))
    assert sorted(back.to_pylist(), key=lambda r: r["doc_id"]) == ROWS


def test_on_error_skip_rejects_nonspec_and_schema_conflicts(ray_session, tmp_path):
    """json.loads is laxer than pyarrow.json: NaN/Infinity lines and
    schema-conflicting values must be SKIPPED, not crash the block."""
    import json as _json

    from rify_ray.sources import read_jsonl

    p = tmp_path / "bad2.jsonl"
    lines = [
        _json.dumps(ROWS[0]),
        '{"doc_id": NaN, "text": "x", "tag": "t"}',       # non-spec constant
        '{"doc_id": "abc", "text": "y", "tag": "t"}',      # schema conflict
        _json.dumps(ROWS[1]),
    ]
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    back = _collect(read_jsonl(str(p), schema=SCHEMA, on_error="skip"))
    got = sorted(back.to_pylist(), key=lambda r: r["doc_id"])
    assert got == [ROWS[0], ROWS[1]]
