"""TripleStore: durable hash-partitioned quad store."""

import os

import pyarrow as pa
import pytest

from rify_ray.state import TripleStore

pytestmark = pytest.mark.usefixtures("ray_session")


def _quads(rows):
    return pa.table(
        {
            "s": pa.array([r[0] for r in rows], pa.string()),
            "p": pa.array([r[1] for r in rows], pa.string()),
            "o": pa.array([r[2] for r in rows], pa.string()),
            "g": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def test_add_dedup_contains_reload(tmp_path):
    store = TripleStore(str(tmp_path / "kg"), num_partitions=4)
    q1 = [("a", "p", "b", "g"), ("b", "p", "c", "g"), ("a", "p", "b", "g")]
    m1 = store.add(_quads(q1))
    assert m1["added"] == 2
    # insert-if-absent: overlapping second add
    q2 = [("a", "p", "b", "g"), ("c", "p", "d", "g")]
    m2 = store.add(_quads(q2))
    assert m2["added"] == 1
    assert store.count() == 3

    got = {
        (r["s"], r["p"], r["o"], r["g"]) for r in store.dataset().take_all()
    }
    assert got == {("a", "p", "b", "g"), ("b", "p", "c", "g"), ("c", "p", "d", "g")}

    hit = store.contains(_quads([("a", "p", "b", "g"), ("z", "z", "z", "z")]))
    assert hit.num_rows == 1

    # reload from disk (resume path)
    store2 = TripleStore(str(tmp_path / "kg"))
    assert store2.count() == 3
    assert store2.num_partitions == 4
    m3 = store2.add(_quads(q1))  # idempotent re-add
    assert m3["added"] == 0


def test_add_clears_stale_uncommitted_generation(tmp_path):
    """A crash between write_parquet and the manifest commit leaves
    partial files in the next generation dir; the retried add must
    replace them, not write alongside (which would double rows)."""
    store = TripleStore(str(tmp_path / "kg"), num_partitions=2)
    store.add(_quads([("a", "p", "b", "g")]))
    # simulate a crashed add: gen=00001 written but never committed
    stale_dir = tmp_path / "kg" / "gen=00001" / "part=0"
    os.makedirs(stale_dir)
    import pyarrow.parquet as pq

    pq.write_table(_quads([("x", "p", "y", "g"), ("y", "p", "z", "g")]), stale_dir / "stale.parquet")
    store.add(_quads([("x", "p", "y", "g"), ("y", "p", "z", "g")]))
    assert store.count() == 3
    assert store.dataset().count() == 3  # stale files gone, not doubled


def test_partition_layout_and_compact(tmp_path):
    store = TripleStore(str(tmp_path / "kg"), num_partitions=4)
    rows = [(f"s{i}", "p", f"o{i}", "g") for i in range(50)]
    store.add(_quads(rows))
    store.add(_quads([(f"s{i}", "q", f"o{i}", "g") for i in range(50)]))
    gen0 = os.listdir(tmp_path / "kg" / "gen=00000")
    assert any(d.startswith("part=") for d in gen0)
    assert store.count() == 100

    store.compact()
    assert store.count() == 100
    assert len(store.generations) == 1
    got = store.dataset().count()
    assert got == 100


@pytest.mark.parametrize("driver_rows", [2_000_000, 0])
def test_delete_facts_both_regimes(tmp_path, driver_rows):
    """delete_facts: driver-polars regime (store under the bound) and
    the distributed two-pass regime (driver_rows=0) must agree — same
    per-generation hit counts, same survivors, untouched generations
    never rewritten."""
    import polars as pl

    store = TripleStore(str(tmp_path / f"kg{driver_rows}"), num_partitions=4)
    g0 = [("a", "p", "b", "g"), ("b", "p", "c", "g")]
    g1 = [("c", "p", "d", "g"), ("d", "p", "e", "g")]
    g2 = [("e", "p", "f", "g")]
    for q in (g0, g1, g2):
        store.add(_quads(q))
    victims = pl.DataFrame(
        {
            "s": ["a", "d", "zz"],
            "p": ["p", "p", "p"],
            "o": ["b", "e", "zz"],
            "g": ["g", "g", "g"],
        }
    )
    gen2_dir_before = store.generations[2]["gen"]
    res = store.delete_facts(victims, driver_rows=driver_rows)
    assert res["deleted"] == 2
    assert len(res["gens_rewritten"]) == 2
    # untouched generation keeps its directory
    assert store.generations[2]["gen"] == gen2_dir_before
    got = {(r["s"], r["p"], r["o"], r["g"]) for r in store.dataset().take_all()}
    assert got == {("b", "p", "c", "g"), ("c", "p", "d", "g"), ("e", "p", "f", "g")}
    assert store.count() == 3
    # per-generation bookkeeping survives the rewrite
    assert [g["rows"] for g in store.generations] == [1, 1, 1]
    # reload from disk agrees
    s2 = TripleStore(str(tmp_path / f"kg{driver_rows}"))
    assert s2.count() == 3
