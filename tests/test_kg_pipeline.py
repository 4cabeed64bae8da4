"""KG construction pipeline tests (BASELINE.json north_star contract):

- extraction is byte-identical per url across parallelism levels;
- linked + canonicalized triples equal the closed-form per-page sets;
- flagship pipeline derives the M² ancestor closure.
"""

import pyarrow as pa
import pytest

from rify_ray.pipelines.kg import build_triples, kg_construct_and_infer
from rify_ray.sources import expected_page_triples, pages_dataset, pages_table
from rify_ray.sources.pages import alias_index
from rify_ray.stages.extract import extract_stage, extract_text_array

from fixtures import ancestry_rules

pytestmark = pytest.mark.usefixtures("ray_session")


def test_vectorized_generation_matches_scalar_reference():
    """pages_batch (Arrow-kernel assembly) must be byte-identical to the
    scalar render_page reference."""
    from rify_ray.sources.pages import pages_batch, render_page

    t = pages_batch(range(0, 97), 13)
    for k, i in enumerate(range(0, 97)):
        u, ts, h, txt, lang = render_page(i, 13)
        assert t["url"][k].as_py() == u
        assert t["warc_ts"][k].value == ts
        assert t["html"][k].as_py() == h
        assert t["text"][k].as_py() == txt
        assert t["lang"][k].as_py() == lang


def test_extraction_matches_golden_text():
    tbl = pages_table(120)
    ext = extract_text_array(tbl["html"])
    assert [a.as_py() for a in ext] == tbl["text"].to_pylist()


@pytest.mark.parametrize("blocks", [2, 7])
def test_extraction_byte_identical_across_parallelism(blocks):
    tbl = pages_table(120)
    golden = dict(zip(tbl["url"].to_pylist(), tbl["text"].to_pylist()))
    ds = pages_dataset(120, override_num_blocks=blocks)
    out = extract_stage(ds).select_columns(["url", "text"]).take_all()
    assert len(out) == 120
    for r in out:
        assert r["text"] == golden[r["url"]]


def test_build_triples_matches_expected():
    n, m = 200, 40
    quads = build_triples(pages_dataset(n, m, override_num_blocks=4), alias_index(m), concurrency=2)
    got = {(r["s"], r["p"], r["o"]) for r in quads.take_all()}
    assert got == expected_page_triples(n, m)
    # dedup: no duplicates
    rows = [(r["s"], r["p"], r["o"], r["g"]) for r in quads.take_all()]
    assert len(rows) == len(set(rows))


def test_no_mentions_yields_none():
    import ray.data

    junk = pa.table(
        {
            "url": ["https://ex.org/x1"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": [b"<html><body><p>nothing here.</p></body></html>"],
            "text": [""],
            "lang": ["en"],
        }
    )
    assert build_triples(ray.data.from_arrow(junk), alias_index(4), concurrency=1) is None


def test_provenance_graphs():
    """graph=None keeps per-page provenance: g = url, and the engine's
    graph separation means per-page facts do not join across pages."""
    n, m = 40, 10
    quads = build_triples(
        pages_dataset(n, m, override_num_blocks=2),
        alias_index(m),
        concurrency=1,
        graph=None,
    )
    rows = quads.take_all()
    assert all(r["g"].startswith("https://ex.org/p/") for r in rows)
    # url graphs are distinct per page for the same (s,p,o)
    assert len({r["g"] for r in rows}) > 1


def test_validate_many():
    from rify_ray import engine

    facts = pages_table(0)  # unused; keep import noise low
    rules = ancestry_rules()
    from rify_ray.model import RuleApplication

    proofs = [
        [RuleApplication(0, (f"n{i}", f"n{i+1}"))] for i in range(20)
    ]
    outs = engine.validate_many(rules, proofs)
    assert len(outs) == 20
    for i, v in enumerate(outs):
        assert (f"n{i}", "ancestor", f"n{i+1}", "default_graph") in v.implied


def test_flagship_closure():
    n, m = 150, 30
    res = kg_construct_and_infer(
        pages_dataset(n, m, override_num_blocks=4), ancestry_rules(), m, concurrency=2
    )
    derived = res.derived()
    anc = {
        (s, o)
        for s, p, o, g in derived.select(["s", "p", "o", "g"]).iter_rows()
        if p == "ancestor"
    }
    assert anc == {(f"ent:person_{i}", f"ent:person_{j}") for i in range(m) for j in range(m)}


def test_parquet_pages_roundtrip(tmp_path):
    """The canonical input contract: pages persisted as a Parquet table
    (url, warc_ts, html, text, lang) and re-read through read_pages
    yield the identical triples as the in-memory source."""
    from rify_ray.sources.pages import alias_index, read_pages, write_pages_parquet

    n, m = 120, 20
    write_pages_parquet(str(tmp_path / "pages"), n, m, override_num_blocks=4)
    direct = build_triples(
        pages_dataset(n, m, override_num_blocks=4), alias_index(m), concurrency=2
    )
    reread = build_triples(
        read_pages(str(tmp_path / "pages")), alias_index(m), concurrency=2
    )
    a = {tuple(r.values()) for r in direct.take_all()}
    b = {tuple(r.values()) for r in reread.take_all()}
    assert a == b and len(a) > 0
    # schema validation fails fast on a malformed corpus
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"url": pa.array(["x"])}), tmp_path / "bad.parquet")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_pages(str(tmp_path / "bad.parquet"))


def test_flagship_store_path_matches_driver_path(tmp_path):
    """The promoted (store-resident) flagship derives the identical fact
    set as the driver-resident pipeline on the same pages."""
    from rify_ray.pipelines.kg import kg_construct_and_infer_store

    n, m = 150, 30
    res = kg_construct_and_infer(
        pages_dataset(n, m, override_num_blocks=4), ancestry_rules(), m, concurrency=2
    )
    driver_set = set(
        map(tuple, res.derived().select(["s", "p", "o", "g"]).iter_rows())
    )
    store = kg_construct_and_infer_store(
        pages_dataset(n, m, override_num_blocks=4), ancestry_rules(), m,
        str(tmp_path / "kg"), concurrency=2, num_partitions=4,
    )
    store_set = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in store.decoded_dataset(first_gen=1).take_all()
    }
    assert store_set == driver_set
