"""Resumable partitioned Parquet sink: per-bucket _SUCCESS markers,
crash-resume skips complete buckets and rewrites partial ones."""

import os

import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _ds(n=200):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(range(n), pa.int64()),
                "v": pa.array([f"v{i}" for i in range(n)], pa.string()),
            }
        )
    )


def _read_all(path):
    from rify_ray.sinks import read_partitioned_parquet

    rows = read_partitioned_parquet(path).take_all()
    return sorted((r["k"], r["v"]) for r in rows)


def test_write_and_read_roundtrip(tmp_path):
    from rify_ray.sinks import write_partitioned_parquet

    path = str(tmp_path / "out")
    m = write_partitioned_parquet(_ds(), path, key_cols=["k"], num_buckets=8)
    assert m["rows_written"] == 200 and m["skipped"] == []
    assert len(m["written"]) == 8
    assert _read_all(path) == [(i, f"v{i}") for i in range(200)]
    # every bucket dir carries a marker
    for b in m["written"]:
        assert os.path.exists(os.path.join(path, f"bucket={b}", "_SUCCESS"))


def test_resume_skips_complete_and_rewrites_partial(tmp_path):
    from rify_ray.sinks import write_partitioned_parquet

    path = str(tmp_path / "out")
    m1 = write_partitioned_parquet(_ds(), path, key_cols=["k"], num_buckets=8)
    # simulate a crashed attempt: bucket 3 lost its marker and holds a
    # duplicate stale file
    crashed = os.path.join(path, "bucket=3")
    os.remove(os.path.join(crashed, "_SUCCESS"))
    import shutil

    stale = [f for f in os.listdir(crashed) if f.endswith(".parquet")][0]
    shutil.copy(os.path.join(crashed, stale), os.path.join(crashed, "dup-" + stale))
    # record the complete buckets' mtimes — resume must not touch them
    mtimes = {
        b: os.path.getmtime(os.path.join(path, f"bucket={b}"))
        for b in m1["written"]
        if b != 3
    }
    m2 = write_partitioned_parquet(_ds(), path, key_cols=["k"], num_buckets=8)
    assert m2["written"] == [3]
    assert m2["skipped"] == sorted(mtimes)
    # exactly-once after resume: no duplicates, nothing lost
    assert _read_all(path) == [(i, f"v{i}") for i in range(200)]
    for b, t in mtimes.items():
        assert os.path.getmtime(os.path.join(path, f"bucket={b}")) == t


def test_noop_when_everything_complete(tmp_path):
    from rify_ray.sinks import write_partitioned_parquet

    path = str(tmp_path / "out")
    write_partitioned_parquet(_ds(50), path, key_cols=["k"], num_buckets=4)
    m = write_partitioned_parquet(_ds(50), path, key_cols=["k"], num_buckets=4)
    assert m["written"] == [] and m["rows_written"] == 0
    assert len(m["skipped"]) == 4
    assert _read_all(path) == [(i, f"v{i}") for i in range(50)]


def test_read_requires_complete_bucket(tmp_path):
    from rify_ray.sinks import read_partitioned_parquet, write_partitioned_parquet

    path = str(tmp_path / "out")
    write_partitioned_parquet(_ds(20), path, key_cols=["k"], num_buckets=2)
    for name in os.listdir(path):
        if name.startswith("bucket="):
            os.remove(os.path.join(path, name, "_SUCCESS"))
    with pytest.raises(FileNotFoundError):
        read_partitioned_parquet(path)


def test_resume_wipes_crashed_staging_dirs(tmp_path):
    """A crash can leave Ray's hive staging dir (__bucket=K) behind; a
    resumed write must wipe it or the rename publishes duplicates."""
    import shutil

    from rify_ray.sinks import BUCKET_COL, write_partitioned_parquet

    path = str(tmp_path / "out")
    write_partitioned_parquet(_ds(), path, key_cols=["k"], num_buckets=8)
    # simulate the crash: bucket 3 unmarked, plus a stale staging dir
    # holding a copy of its data (what a mid-write crash leaves)
    crashed = os.path.join(path, "bucket=3")
    os.remove(os.path.join(crashed, "_SUCCESS"))
    staging = os.path.join(path, f"{BUCKET_COL}=3")
    os.makedirs(staging)
    for f in os.listdir(crashed):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(crashed, f), os.path.join(staging, "stale-" + f))
    write_partitioned_parquet(_ds(), path, key_cols=["k"], num_buckets=8)
    # exactly-once: the stale staging files must not have been published
    assert _read_all(path) == [(i, f"v{i}") for i in range(200)]


def test_empty_write_reads_back_empty(tmp_path):
    from rify_ray.sinks import read_partitioned_parquet, write_partitioned_parquet

    path = str(tmp_path / "out")
    m = write_partitioned_parquet(_ds(0), path, key_cols=["k"], num_buckets=4)
    assert m["rows_written"] == 0
    out = read_partitioned_parquet(path)
    assert out.count() == 0
    assert set(out.schema().base_schema.names) == {"k", "v"}


def test_resume_mapping_mismatch_raises(tmp_path):
    """A resume under different key_cols/num_buckets would skip buckets
    computed under the old mapping (silent row loss/duplication) — the
    persisted sink manifest turns that into a loud error."""
    import pytest

    from rify_ray.sinks import write_partitioned_parquet

    path = str(tmp_path / "out")
    write_partitioned_parquet(_ds(), path, key_cols=["k"], num_buckets=8)
    with pytest.raises(ValueError, match="resume mismatch"):
        write_partitioned_parquet(_ds(), path, key_cols=["k"], num_buckets=16)
    with pytest.raises(ValueError, match="resume mismatch"):
        write_partitioned_parquet(_ds(), path, key_cols=["v"], num_buckets=8)
    # same mapping resumes fine (everything already complete)
    m = write_partitioned_parquet(_ds(), path, key_cols=["k"], num_buckets=8)
    assert m["rows_written"] == 0 and len(m["skipped"]) == 8
    # full rewrite opt-out re-baselines the manifest
    m2 = write_partitioned_parquet(
        _ds(), path, key_cols=["k"], num_buckets=4, skip_complete=False
    )
    assert m2["rows_written"] == 200
    assert _read_all(path) == [(i, f"v{i}") for i in range(200)]
