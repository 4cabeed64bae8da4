"""Unit tests for the training-data stages: text analysis, dedup
family, similarity search, multimodal plumbing.

These complement the DuckDB-oracle checks the driver runs: here we pin
closed-form expectations on small deterministic inputs.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------


def test_quality_score_fn():
    from rify_ray.stages.text import quality_score_fn

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["x the cat and a dog, fine!", ""], pa.string()),
        }
    )
    q = quality_score_fn(batch)
    # 6 tokens... tokens = x,the,cat,and,a,dog,,fine! -> 7? count \S+ runs
    # "x the cat and a dog, fine!" -> ['x','the','cat','and','a','dog,','fine!'] = 7
    # stopwords (padded): " the "=1, " and "=1, " a "=1 -> 3 -> 3*10000//7 = 4285
    assert q["stopword_bp"].to_pylist() == [4285, 0]
    # punct: ',' + '!' = 2 of 26 chars -> 20000//26 = 769
    assert q["punct_bp"].to_pylist() == [769, 0]
    # nonspace = 26-6=20 -> 2000//7 = 285
    assert q["token_len_c"].to_pylist() == [285, 0]


def test_token_count_and_char_stats():
    from rify_ray.stages.text import char_stats_fn, token_count_fn

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a bb  ccc", "", "x1 2y"], pa.string()),
        }
    )
    tc = token_count_fn(batch)
    assert tc["n_tokens"].to_pylist() == [3, 0, 2]
    cs = char_stats_fn(batch)
    assert cs["n_chars"].to_pylist() == [9, 0, 5]
    assert cs["n_alpha"].to_pylist() == [6, 0, 2]
    assert cs["n_digit"].to_pylist() == [0, 0, 2]
    assert cs["n_space"].to_pylist() == [3, 0, 1]


def test_lang_id_markers():
    from rify_ray.stages.text import lang_id_fn

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "it is the house of the king and the queen",
                    "das ist der hund und die katze und der vogel",
                    "voici le chat et la souris et le chien",
                    "no markers at all",  # tie at 0 -> first language wins
                ],
                pa.string(),
            ),
        }
    )
    out = lang_id_fn(batch)
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "en"]


def test_fingerprint_is_md5():
    import hashlib

    from rify_ray.stages.text import fingerprint_fn

    batch = pa.table(
        {"doc_id": pa.array([7], pa.int64()), "text": pa.array(["hello"], pa.string())}
    )
    out = fingerprint_fn(batch)
    assert out["fingerprint"].to_pylist() == [hashlib.md5(b"hello").hexdigest()]


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_exact_dedup_keeps_min_id():
    from rify_ray.stages.dedup import exact_dedup

    ds = _docs(["same", "other", "same", "same", "other"])
    out = exact_dedup(ds)
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert ids == [0, 1]


def test_minhash_finds_near_duplicates():
    from rify_ray.stages.dedup import minhash_lsh_candidates, verify_pairs_jaccard

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "hazy")
    other = "completely different content about distributed dataflow engines " * 5
    ds = _docs([base, near, other])
    cands = minhash_lsh_candidates(ds)
    pairs = {(r["id1"], r["id2"]) for r in cands.take_all()}
    assert (0, 1) in pairs
    verified = verify_pairs_jaccard(cands, ds, threshold=0.5)
    vpairs = {(r["id1"], r["id2"]) for r in verified.take_all()}
    assert (0, 1) in vpairs
    assert (0, 2) not in vpairs and (1, 2) not in vpairs


def test_salted_bucket_pairs_accounting():
    """Hot-bucket salting: no pair inside a salt subgroup is lost, every
    skipped cross-subgroup pair is counted, and bridge pairs keep the
    bucket one connected component."""
    import numpy as np

    from rify_ray.stages.dedup import _salted_bucket_pairs

    band = np.zeros(10, dtype=np.int64)
    bkey = np.zeros(10, dtype=np.int64)
    ids = np.arange(10, dtype=np.int64)
    id1, id2, stats = _salted_bucket_pairs(band, bkey, ids, 4)
    # subgroups 4+4+2 → 6+6+1 within-subgroup pairs + 2 bridges = 15;
    # possible C(10,2)=45 → 30 dropped, all accounted
    assert stats == {
        "n_buckets": 1,
        "oversized_buckets": 1,
        "emitted_pairs": 15,
        "dropped_pairs": 30,
    }
    emitted = set(zip(id1.tolist(), id2.tolist()))
    assert len(emitted) == 15
    # the first salt subgroup [0..3] is complete
    for i in range(4):
        for j in range(i + 1, 4):
            assert (i, j) in emitted
    # union-find: one component despite the cap
    parent = list(range(10))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in emitted:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(10)}) == 1


def test_minhash_candidates_salting_stats_out():
    from rify_ray.stages.dedup import minhash_lsh_candidates

    base = "identical boilerplate page content repeated verbatim " * 5
    uniq = [f"document number {i} with its own distinct words {i * 7919} " * 3 for i in range(4)]
    ds = _docs([base] * 8 + uniq)
    stats = {}
    out = minhash_lsh_candidates(ds, max_bucket_size=3, stats_out=stats)
    assert stats["oversized_buckets"] >= 1
    assert stats["dropped_pairs"] > 0
    pairs = {(r["id1"], r["id2"]) for r in out.take_all()}
    # connectivity of the 8 identical docs survives the cap
    parent = list(range(12))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(8)}) == 1


def test_minhash_verified_prefilter_margin_none():
    """prefilter_margin=None disables the signature prefilter: the
    result must equal the exact verify of every LSH candidate."""
    from rify_ray.stages.dedup import minhash_verified_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "hazy")
    other = "completely different content about distributed dataflow engines " * 5
    ds = _docs([base, near, other])
    with_pref = {
        (r["id1"], r["id2"]) for r in minhash_verified_pairs(ds, threshold=0.5).take_all()
    }
    without = {
        (r["id1"], r["id2"])
        for r in minhash_verified_pairs(ds, threshold=0.5, prefilter_margin=None).take_all()
    }
    assert (0, 1) in without
    assert with_pref == without


def _reference_components(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def test_duplicate_clusters_both_paths():
    """Driver union-find and distributed min-label propagation must agree
    with a reference union-find on a random pair graph."""
    import numpy as np
    import ray.data

    from rify_ray.stages.dedup import duplicate_clusters

    rs = np.random.RandomState(11)
    edges = set()
    while len(edges) < 120:
        a, b = rs.randint(0, 90, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    # a long chain forces many propagation rounds on the distributed path
    edges.update((i + 200, i + 201) for i in range(25))
    pairs_tbl = pa.table(
        {
            "id1": pa.array([a for a, _ in sorted(edges)], pa.int64()),
            "id2": pa.array([b for _, b in sorted(edges)], pa.int64()),
        }
    )
    nodes = sorted({x for e in edges for x in e})
    expect = _reference_components(edges, nodes)
    for kwargs in ({}, {"broadcast_rows": 0, "num_partitions": 4}):
        out = duplicate_clusters(ray.data.from_arrow(pairs_tbl), **kwargs)
        got = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
        assert got == expect, f"mismatch under {kwargs}"


def test_exact_dup_pairs_clusters_match_text_groups():
    from rify_ray.stages.dedup import duplicate_clusters, exact_dup_pairs

    texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa", "unique"]
    ds = _docs(texts)
    out = duplicate_clusters(exact_dup_pairs(ds))
    got = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert got == {0: 0, 2: 0, 5: 0, 1: 1, 4: 1}


def test_ngram_jaccard_bounds():
    from rify_ray.stages.dedup import ngram_jaccard

    assert ngram_jaccard("abcdefgh", "abcdefgh") == 1.0
    assert ngram_jaccard("aaaaaaa", "zzzzzzz") == 0.0


def test_ngram_jaccard_pairs_matches_bruteforce():
    from rify_ray.stages.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("lazy", "hazy")
    other = "completely different content about distributed dataflow engines " * 3
    texts = [base, near, other, base + " tail", other.replace("engines", "systems")]
    out = ngram_jaccard_pairs(
        _docs(texts), k=5, threshold_num=1, threshold_den=2, max_df=len(texts)
    )
    got = {
        (r["id1"], r["id2"]): (r["inter_n"], r["union_n"]) for r in out.take_all()
    }

    # brute force over char-5-gram sets with the same rational threshold
    def sh(t):
        return {t[i : i + 5] for i in range(len(t) - 4)}

    expect = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = sh(texts[i]), sh(texts[j])
            inter = len(a & b)
            uni = len(a | b)
            if 2 * inter >= uni and inter > 0:
                expect[(i, j)] = (inter, uni)
    assert got == expect


def test_ngram_jaccard_pairs_df_cap_drops_boilerplate():
    from rify_ray.stages.dedup import ngram_jaccard_pairs

    # every doc shares the boilerplate prefix; distinct tails.  With
    # max_df below the corpus size every shared shingle is boilerplate,
    # so NO candidates are generated (the documented df-cap semantic,
    # not a silent truncation of true pairs)
    boiler = "all rights reserved copyright notice footer text here "
    texts = [boiler + f"unique tail number {i} content" for i in range(6)]
    out = ngram_jaccard_pairs(
        _docs(texts), k=5, threshold_num=1, threshold_den=100, max_df=3
    )
    assert out.take_all() == []
    # raising the cap above the corpus size restores the pairs
    out2 = ngram_jaccard_pairs(
        _docs(texts), k=5, threshold_num=1, threshold_den=100, max_df=6
    )
    assert len(out2.take_all()) == 15  # all C(6,2) pairs share the prefix


def test_salted_bucket_pairs_drop_mode():
    import numpy as np

    from rify_ray.stages.dedup import _salted_bucket_pairs

    # bucket A: 3 members (kept), bucket B: 5 members (dropped at cap 4)
    band = np.zeros(8, dtype=np.int64)
    bkey = np.array([1, 1, 1, 2, 2, 2, 2, 2], dtype=np.int64)
    ids = np.arange(8, dtype=np.int64)
    id1, id2, stats = _salted_bucket_pairs(band, bkey, ids, 4, oversized="drop")
    pairs = set(zip(id1.tolist(), id2.tolist()))
    assert pairs == {(0, 1), (0, 2), (1, 2)}
    assert stats["n_buckets"] == 2
    assert stats["oversized_buckets"] == 1
    assert stats["emitted_pairs"] == 3
    # dropped = C(5,2) = 10 (no bridges in drop mode)
    assert stats["dropped_pairs"] == 10
    # salt mode on the same input keeps bucket B connected via a bridge
    s1, s2, sstats = _salted_bucket_pairs(band, bkey, ids, 4, oversized="salt")
    spairs = set(zip(s1.tolist(), s2.tolist()))
    assert {(0, 1), (0, 2), (1, 2)}.issubset(spairs)
    assert (6, 7) in spairs  # bridge pair into the overflow subgroup


def test_simhash_near_duplicates():
    from rify_ray.stages.dedup import simhash_candidates

    # near-dup detection via simhash needs many distinct (low-weight)
    # tokens: one changed word among 200 flips only the bits with weak
    # vote margins
    base = " ".join(f"word{i}" for i in range(200))
    near = base.replace("word100", "wordX")
    other = " ".join(f"zz{i}" for i in range(200))
    ds = _docs([base, near, other])
    out = simhash_candidates(ds, max_hamming=16)
    assert out is not None
    pairs = {(r["id1"], r["id2"]) for r in out.take_all()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_embedding_neardup():
    import ray.data

    from rify_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.RandomState(0)
    a = rng.normal(size=16)
    vecs = [a, a + rng.normal(scale=0.01, size=16), rng.normal(size=16)]
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    out = embedding_neardup_pairs(emb, threshold=0.95)
    pairs = {(r["id1"], r["id2"]) for r in out.take_all()}
    assert pairs == {(0, 1)}


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------


def _embeddings_ds(n=50, dim=8, seed=3):
    import ray.data

    rng = np.random.RandomState(seed)
    mat = rng.normal(size=(n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat], pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(tbl), mat


def test_knn_brute_matches_numpy():
    from rify_ray.stages.similarity import knn_brute

    ds, mat = _embeddings_ds()
    fmat = np.asarray(mat, dtype=np.float32).astype(np.float64)
    qids = np.array([0, 1], dtype=np.int64)
    out = knn_brute(ds, qids, fmat[:2], k=3, batch_size=16)
    rows = sorted(
        ((r["query_id"], r["rank"], r["neighbor_id"]) for r in out.take_all())
    )
    # numpy reference
    nm = fmat / np.linalg.norm(fmat, axis=1)[:, None]
    exp = []
    for q in (0, 1):
        sims = nm[q] @ nm.T
        order = [i for i in np.lexsort((np.arange(len(sims)), -sims)) if i != q][:3]
        exp.extend((q, r + 1, int(i)) for r, i in enumerate(order))
    assert rows == sorted(exp)


def test_knn_lsh_recall_vs_brute():
    """Single-pass LSH with multi-probe: recall against brute force is
    measured, not just 'returns something'."""
    from rify_ray.stages.similarity import knn_brute, knn_lsh

    ds, mat = _embeddings_ds(n=200, dim=16)
    fmat = np.asarray(mat, dtype=np.float32).astype(np.float64)
    qids = np.arange(5, dtype=np.int64)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute(ds, qids, fmat[:5], k=5).take_all()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh(ds, qids, fmat[:5], k=5, nbits=4, multiprobe=1).take_all()
    }
    recall = len(approx & brute) / len(brute)
    assert recall >= 0.5, recall  # random gaussian vectors: LSH floor
    # ranks are deterministic and 1-based per query
    got = knn_lsh(ds, qids, fmat[:5], k=5, nbits=4, multiprobe=1).take_all()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_knn_ivf_recall_vs_brute():
    """IVF coarse quantization: recall against brute force with nprobe
    covering a quarter of the lists."""
    from rify_ray.stages.similarity import knn_brute, knn_ivf

    ds, mat = _embeddings_ds(n=200, dim=16)
    fmat = np.asarray(mat, dtype=np.float32).astype(np.float64)
    qids = np.arange(5, dtype=np.int64)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute(ds, qids, fmat[:5], k=5).take_all()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(ds, qids, fmat[:5], k=5, nlist=8, nprobe=3).take_all()
    }
    recall = len(approx & brute) / len(brute)
    assert recall >= 0.6, recall


def test_embed_neardup_recall_vs_brute():
    """Banded-hyperplane near-dup finds exactly the brute-force pair set
    on a mixed cluster/noise instance (recall test from VERDICT.md)."""
    import ray.data

    from rify_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.RandomState(11)
    base = rng.normal(size=(6, 16))
    vecs = []
    for b in base:
        vecs.append(b)
        vecs.append(b + rng.normal(scale=0.05, size=16))  # near-dup partner
    vecs.extend(rng.normal(size=(30, 16)))
    vecs = np.asarray(vecs)
    n = len(vecs)
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float64())),
            }
        )
    )
    threshold = 0.9
    norm = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = norm @ norm.T
    brute = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if sims[i, j] >= threshold
    }
    got = {
        (r["id1"], r["id2"])
        for r in embedding_neardup_pairs(emb, threshold=threshold).take_all()
    }
    assert got == brute


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def test_media_stage_fake_decode_deterministic():
    import ray.data

    from rify_ray.stages.multimodal import media_stage, synthetic_media_table

    media = ray.data.from_arrow(synthetic_media_table(30))
    out1 = sorted(
        (r["media_id"], r["width"], r["height"], tuple(r["feature"]))
        for r in media_stage(media, backend="fake", concurrency=2).take_all()
    )
    out2 = sorted(
        (r["media_id"], r["width"], r["height"], tuple(r["feature"]))
        for r in media_stage(media, backend="fake", concurrency=2, batch_size=7).take_all()
    )
    assert out1 == out2
    assert len(out1) == 30


def test_media_real_backend_raises():
    from rify_ray.stages.multimodal import DecodeStage

    stage = DecodeStage(backend="real")
    # strict real VIDEO decode of a non-Y4M payload fails loudly (a
    # compressed container would need ffmpeg; the vendored Y4M parser
    # rejects foreign bytes)
    batch = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["video"], pa.string()),
            "payload": pa.array([b"xx"], pa.binary()),
            "meta": pa.array(["{}"], pa.string()),
        }
    )
    with pytest.raises(ValueError):
        stage(batch)
    # strict real IMAGE decode of a non-PNG payload fails loudly
    img = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([b"xx"], pa.binary()),
            "meta": pa.array(["{}"], pa.string()),
        }
    )
    with pytest.raises(ValueError):
        stage(img)


def test_png_decoder_roundtrip_all_filters():
    """The vendored PNG parser de-filters every filter type exactly:
    encode a known gradient with each of the five scanline filters and
    recover identical pixels."""
    import struct
    import zlib

    import numpy as np

    from rify_ray.stages.multimodal import _PNG_SIG, _png_decode_gray

    w = h = 12
    arr = ((np.add.outer(np.arange(h), np.arange(w)) * 11 + 5) % 256).astype(np.uint8)

    def encode(filter_type: int) -> bytes:
        rows = []
        prev = np.zeros(w, dtype=np.int32)
        for y in range(h):
            cur = arr[y].astype(np.int32)
            if filter_type == 0:
                enc = cur
            elif filter_type == 1:  # Sub (ch=1)
                enc = cur.copy()
                enc[1:] = (cur[1:] - cur[:-1]) & 255
            elif filter_type == 2:  # Up
                enc = (cur - prev) & 255
            elif filter_type == 3:  # Average
                left = np.concatenate([[0], cur[:-1]])
                enc = (cur - ((left + prev) >> 1)) & 255
            else:  # Paeth
                enc = cur.copy()
                for i in range(w):
                    a = int(cur[i - 1]) if i else 0
                    b = int(prev[i])
                    c = int(prev[i - 1]) if i else 0
                    pp = a + b - c
                    pa_, pb, pc_ = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                    enc[i] = (cur[i] - pred) & 255
            rows.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
            prev = cur
        raw = b"".join(rows)

        def chunk(typ, data):
            return struct.pack(">I", len(data)) + typ + data + struct.pack(
                ">I", zlib.crc32(typ + data)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    want = arr.astype(np.float32) / 255.0
    for ft in range(5):
        gw, gh, gray = _png_decode_gray(encode(ft))
        assert (gw, gh) == (w, h)
        assert np.allclose(gray, want), f"filter {ft} mismatch"


def test_media_auto_decodes_real_png():
    """backend='auto' uses the REAL vendored PNG decoder for valid PNG
    payloads — decoded_real=True with true dimensions, deterministic
    across calls and parallelism."""
    import ray.data

    from rify_ray.stages.multimodal import (
        DecodeStage,
        _synthetic_png,
        media_stage,
        synthetic_media_table,
    )

    media = ray.data.from_arrow(synthetic_media_table(30, real_audio=True, real_image=True))
    rows1 = sorted(
        (r["media_id"], r["kind"], r["width"], r["height"], r["decoded_real"], tuple(r["feature"]))
        for r in media_stage(media, backend="auto", concurrency=2).take_all()
    )
    rows2 = sorted(
        (r["media_id"], r["kind"], r["width"], r["height"], r["decoded_real"], tuple(r["feature"]))
        for r in media_stage(media, backend="auto", concurrency=2, batch_size=7).take_all()
    )
    assert rows1 == rows2
    by_kind = {}
    for _mid, kind, _w, _h, real, _f in rows1:
        by_kind.setdefault(kind, set()).add(real)
    # ≥2 kinds decode REAL in this container: PNG images + WAV audio
    assert by_kind["image"] == {True}
    assert by_kind["audio"] == {True}
    assert by_kind["video"] == {False}
    # true dimensions come from the IHDR, not the digest fake
    png0 = next(r for r in rows1 if r[0] == 0)
    assert (png0[2], png0[3]) == (24, 24)
    # strict real backend on a single PNG agrees with auto
    batch = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([_synthetic_png(0)], pa.binary()),
            "meta": pa.array(["{}"], pa.string()),
        }
    )
    strict = DecodeStage(backend="real")(batch)
    assert strict["decoded_real"].to_pylist() == [True]
    assert strict["width"].to_pylist() == [24]


def test_media_stage_auto_backend_falls_back_deterministically():
    """backend='auto' on payloads no real decoder can parse must equal
    the fake backend row for row, with decoded_real=False — green in
    every environment regardless of which libraries exist."""
    import ray.data

    from rify_ray.stages.multimodal import media_stage, synthetic_media_table

    media = ray.data.from_arrow(synthetic_media_table(30))
    fake = sorted(
        (r["media_id"], r["width"], r["height"], tuple(r["feature"]))
        for r in media_stage(media, backend="fake", concurrency=2).take_all()
    )
    auto_rows = media_stage(media, backend="auto", concurrency=2).take_all()
    auto = sorted(
        (r["media_id"], r["width"], r["height"], tuple(r["feature"])) for r in auto_rows
    )
    assert auto == fake
    assert all(r["decoded_real"] is False or r["decoded_real"] == False for r in auto_rows)  # noqa: E712


def test_media_auto_decodes_real_wav():
    """backend='auto' uses the REAL stdlib-wave decoder for a valid WAV
    payload (this container has no PIL/ffmpeg, but wave is stdlib)."""
    import io
    import wave as wave_mod

    import numpy as np

    from rify_ray.stages.multimodal import DecodeStage, probe_backends

    assert probe_backends()["audio"] is True
    buf = io.BytesIO()
    rate, n = 16000, 1600
    tone = (np.sin(2 * np.pi * 440 * np.arange(n) / rate) * 20000).astype(np.int16)
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(tone.tobytes())
    payload = buf.getvalue()
    batch = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "kind": pa.array(["audio"], pa.string()),
            "payload": pa.array([payload], pa.binary()),
            "meta": pa.array(["{}"], pa.string()),
        }
    )
    out = DecodeStage(backend="auto")(batch)
    assert out["decoded_real"].to_pylist() == [True]
    assert out["width"].to_pylist() == [16]        # kHz
    assert out["height"].to_pylist() == [16]       # 1 channel × 16-bit
    feat = out["feature"].to_pylist()[0]
    assert len(feat) == 8
    # a 440 Hz tone at amplitude 20000/32768 has RMS ≈ 0.43 in every octile
    assert all(0.3 < f < 0.55 for f in feat)
    # determinism across calls
    out2 = DecodeStage(backend="auto")(batch)
    assert out.equals(out2)


def test_frame_sample():
    from rify_ray.stages.multimodal import frame_sample_fn

    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"0123456789"], pa.binary()),
        }
    )
    out = frame_sample_fn(4)(batch)
    assert out["frame_no"].to_pylist() == [0, 1, 2, 3]
    assert out["byte_offset"].to_pylist() == [0, 2, 5, 7]


def test_y4m_decode_roundtrip_and_colorspaces():
    """The vendored stdlib Y4M parser recovers true dimensions, frame
    count, and the exact first-frame luma plane across all supported
    planar colorspaces; truncation and foreign bytes raise ValueError
    (the auto-backend fake-fallback contract)."""
    import numpy as np
    import pytest

    from rify_ray.stages.multimodal import _synthetic_y4m, _y4m_decode

    w, h = 12, 8
    y = ((np.add.outer(np.arange(h), np.arange(w)) * 9) % 256).astype(np.uint8)
    for cs, extra in (
        ("420", 2 * ((w // 2) * (h // 2))),
        ("420jpeg", 2 * ((w // 2) * (h // 2))),
        ("422", 2 * ((w // 2) * h)),
        ("444", 2 * w * h),
        ("mono", 0),
    ):
        frame = b"FRAME\n" + y.tobytes() + bytes(extra)
        payload = f"YUV4MPEG2 W{w} H{h} F30:1 C{cs}\n".encode() + frame * 2
        gw, gh, n, first_y, offs = _y4m_decode(payload)
        assert (gw, gh, n) == (w, h, 2), cs
        assert np.allclose(first_y, y.astype(np.float32) / 255.0), cs
        assert len(offs) == 2 and offs[0] < offs[1]
        assert payload[offs[1] : offs[1] + 5] == b"FRAME"
    syn = _synthetic_y4m(3)
    gw, gh, n, first_y, _ = _y4m_decode(syn)
    assert n == 3 and gw == gh == 16 + (3 % 4) * 2
    with pytest.raises(ValueError):
        _y4m_decode(syn[:-5])  # truncated final frame
    with pytest.raises(ValueError):
        _y4m_decode(b"not a video")
    with pytest.raises(ValueError):
        _y4m_decode(f"YUV4MPEG2 W4 H4 C410\n".encode())  # unsupported cs


def test_media_auto_decodes_real_video_all_three_kinds():
    """With real payloads for all three kinds, backend='auto' decodes
    every row real in this container — images via the vendored PNG
    parser, audio via stdlib wave, video via the vendored Y4M parser —
    and frame sampling returns real container offsets."""
    import ray.data

    from rify_ray.stages.multimodal import (
        DecodeStage,
        _synthetic_y4m,
        frame_sample_fn,
        media_stage,
        synthetic_media_table,
    )

    media_t = synthetic_media_table(
        30, real_audio=True, real_image=True, real_video=True
    )
    rows = media_stage(
        ray.data.from_arrow(media_t), backend="auto", concurrency=2
    ).take_all()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], set()).add(r["decoded_real"])
    assert by_kind == {"image": {True}, "audio": {True}, "video": {True}}
    vid = next(r for r in rows if r["kind"] == "video")
    assert vid["width"] == vid["height"] and vid["width"] in (16, 18, 20, 22)
    # strict real backend no longer raises for video
    batch = pa.table(
        {
            "media_id": pa.array([2], pa.int64()),
            "kind": pa.array(["video"], pa.string()),
            "payload": pa.array([_synthetic_y4m(2)], pa.binary()),
            "meta": pa.array(["{}"], pa.string()),
        }
    )
    strict = DecodeStage(backend="real")(batch)
    assert strict["decoded_real"].to_pylist() == [True]
    # frame sampling on a real container: offsets land on FRAME markers
    fs = frame_sample_fn(2)(batch)
    payload = _synthetic_y4m(2)
    assert fs["frame_no"].to_pylist() == [0, 1]
    for off in fs["byte_offset"].to_pylist():
        assert payload[off : off + 5] == b"FRAME"


# ---------------------------------------------------------------------------
# corpus ops: sampling, decontamination, n-gram top-k, repetition
# ---------------------------------------------------------------------------


def test_stable_sample_deterministic_and_exact():
    from rify_ray.stages.corpus import _KNUTH, _KNUTH_MOD, stable_sample

    ds = _docs(["a"] * 50)
    got = sorted(
        r["doc_id"]
        for r in stable_sample(ds, pct=20, mod=100).take_all()
    )
    want = [i for i in range(50) if (i * _KNUTH % _KNUTH_MOD) % 100 < 20]
    assert got == want
    # stable: a second run returns the identical sample
    assert got == sorted(
        r["doc_id"] for r in stable_sample(_docs(["a"] * 50), pct=20, mod=100).take_all()
    )


def test_stable_sample_rejects_huge_ids():
    import ray.data

    from rify_ray.stages.corpus import stable_sample

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([2**33], pa.int64()), "text": pa.array(["x"])})
    )
    with pytest.raises(Exception):
        stable_sample(ds).take_all()


def test_decontaminate_drops_matching_docs():
    from rify_ray.stages.corpus import decontaminate

    ds = _docs(["clean words here", "contains bad phrase inside", "another clean", "bad phrase"])
    out = decontaminate(ds, ["bad phrase"]).take_all()
    assert sorted(r["doc_id"] for r in out) == [0, 2]
    # empty blocklist keeps everything
    assert len(decontaminate(_docs(["a", "b"]), []).take_all()) == 2


def test_ngram_topk_counts_and_tiebreak():
    from rify_ray.stages.corpus import ngram_topk

    # "a b" x3 (docs 0,1,2), "b c" x2 + "a b" via doc 3 "a b c": that doc
    # contributes "a b" and "b c"
    ds = _docs(["a b", "a b", "b c", "a b c", "b c"])
    rows = ngram_topk(ds, k=2).take_all()
    assert [(r["gram"], r["cnt"]) for r in rows] == [("a b", 3), ("b c", 3)]
    # no cross-document bigrams: two single-token docs yield nothing
    assert ngram_topk(_docs(["solo", "token"]), k=5).take_all() == []


def test_repetition_stats_fn_closed_form():
    from rify_ray.stages.corpus import repetition_stats_fn

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["x x x x", "a b c d", "a a b b"], pa.string()),
        }
    )
    out = repetition_stats_fn()(batch)
    # doc0: 4 tokens 1 distinct -> dup 10000*3//4=7500, top 10000*4//4=10000
    # doc1: all distinct -> 0, top 2500
    # doc2: 4 tokens 2 distinct -> 5000, top 5000
    assert out["dup_word_bp"].to_pylist() == [7500, 0, 5000]
    assert out["top_word_bp"].to_pylist() == [10000, 2500, 5000]


def test_preagg_counts_match_forced_shuffle():
    """The driver-fold and distributed branches of the pre-aggregated
    counts must agree exactly (same rows, any order)."""
    sf = "/root/testdata/sf0.001"
    from rify_ray.pipelines.relational import (
        events_window_counts,
        orders_by_status_priority,
        segment_order_counts,
        top_users_by_events,
    )

    def rows(ds):
        return sorted(tuple(r.values()) for r in ds.take_all())

    assert rows(top_users_by_events(sf, 10)) == rows(
        top_users_by_events(sf, 10, forced_shuffle=True)
    )
    assert rows(orders_by_status_priority(sf)) == rows(
        orders_by_status_priority(sf, forced_shuffle=True)
    )
    assert rows(events_window_counts(sf)) == rows(
        events_window_counts(sf, forced_shuffle=True)
    )
    assert rows(segment_order_counts(sf)) == rows(
        segment_order_counts(sf, mode="shuffle")
    )


def test_rollup_pivot_running_match_forced_shuffle():
    """Driver-fold vs distributed branches of the new relational ops
    agree exactly; rollup levels are internally consistent."""
    sf = "/root/testdata/sf0.001"
    from rify_ray.pipelines.relational import (
        events_type_pivot,
        events_user_running,
        orders_rollup,
    )

    def rows(ds):
        return sorted(tuple(r.values()) for r in ds.take_all())

    roll = rows(orders_rollup(sf))
    assert roll == rows(orders_rollup(sf, forced_shuffle=True))
    # grand total row equals the sum of the finest level
    fine = [r for r in roll if "ALL" not in (r[0], r[1])]
    total = [r for r in roll if r[0] == "ALL" and r[1] == "ALL"]
    assert len(total) == 1
    assert total[0][2] == sum(r[2] for r in fine)
    assert total[0][3] == sum(r[3] for r in fine)

    piv = rows(events_type_pivot(sf))
    assert piv == rows(events_type_pivot(sf, forced_shuffle=True))
    run = rows(events_user_running(sf))
    assert run == rows(events_user_running(sf, forced_shuffle=True))
    # running counts per user end at the user's event count
    import collections

    per_user = collections.Counter(r[1] for r in run)
    max_run = collections.defaultdict(int)
    for r in run:
        max_run[r[1]] = max(max_run[r[1]], r[2])
    assert dict(per_user) == dict(max_run)


def test_asof_join_backward_inner_and_left():
    import ray.data

    from rify_ray.stages.asof import asof_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
                "t": pa.array([10, 20, 5, 10, 10], pa.int64()),
                "lid": pa.array([100, 101, 102, 103, 104], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2], pa.int64()),
                "t": pa.array([8, 15, 10], pa.int64()),
                "rid": pa.array([200, 201, 202], pa.int64()),
            }
        )
    )
    out = asof_join(
        left, right, by="k", on="t",
        left_cols=["lid"], right_cols=[("rid", "rid"), ("t", "rt")],
    ).take_all()
    got = sorted((r["lid"], r["rid"], r["rt"]) for r in out)
    # k=1: t=10 -> rid 200 (t=8); t=20 -> rid 201 (t=15); t=5 -> none
    # k=2: t=10 -> rid 202 (exact match allowed); k=3: no right side
    assert got == [(100, 200, 8), (101, 201, 15), (103, 202, 10)]

    out_left = asof_join(
        left, right, by="k", on="t",
        left_cols=["lid"], right_cols=[("rid", "rid")], how="left",
    ).take_all()
    rows = {r["lid"]: r["rid"] for r in out_left}
    assert rows[102] is None and rows[104] is None and rows[100] == 200
    assert len(out_left) == 5


def test_grouped_topk_both_branches():
    import ray.data

    from rify_ray.stages.corpus import grouped_topk

    tbl = pa.table(
        {
            "src": pa.array(["a"] * 5 + ["b"] * 3, pa.string()),
            "score": pa.array([5, 3, 9, 9, 1, 2, 2, 7], pa.int64()),
            "id": pa.array(list(range(8)), pa.int64()),
        }
    )
    # split across blocks so the partial top-k actually combines
    ds = ray.data.from_arrow([tbl.slice(0, 4), tbl.slice(4)])

    def rows(out):
        return sorted((r["src"], r["score"], r["id"]) for r in out.take_all())

    want = [("a", 5, 0), ("a", 9, 2), ("a", 9, 3), ("b", 2, 5), ("b", 2, 6), ("b", 7, 7)]
    got = rows(
        grouped_topk(ds, key_cols=["src"], order_col="score", tiebreak_col="id", k=3)
    )
    assert got == want
    got_sh = rows(
        grouped_topk(
            ds, key_cols=["src"], order_col="score", tiebreak_col="id", k=3,
            forced_shuffle=True,
        )
    )
    assert got_sh == want


def test_hll_distinct_accuracy():
    import ray.data

    from rify_ray.stages.corpus import hll_distinct

    n = 20_000
    ds = ray.data.range(n, override_num_blocks=8).map_batches(
        lambda b: pa.table({"uid": pc.cast(b["id"], pa.int64())}),
        batch_format="pyarrow",
    )
    est = hll_distinct(ds, "uid", p=12)
    assert abs(est - n) / n < 0.05
    # duplicates don't inflate the estimate
    dup = ray.data.range(n, override_num_blocks=8).map_batches(
        lambda b: pa.table({"uid": pc.cast(pc.bit_wise_and(b["id"], 1023), pa.int64())}),
        batch_format="pyarrow",
    )
    est_dup = hll_distinct(dup, "uid", p=12)
    assert abs(est_dup - 1024) / 1024 < 0.1


def test_range_join_count_window_edges():
    import ray.data

    from rify_ray.stages.asof import range_join_count

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2], pa.int64()),
                "t": pa.array([100, 50, 100], pa.int64()),
                "lid": pa.array([0, 1, 2], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 1], pa.int64()),
                "t": pa.array([90, 100, 101, 79], pa.int64()),
            }
        )
    )
    out = range_join_count(
        left, right, by="k", on="t", low_offset=-20, high_offset=0,
        left_cols=["lid"], count_col="n",
    ).take_all()
    got = {r["lid"]: r["n"] for r in out}
    # lid 0 (t=100, window [80,100]): right 90,100 -> 2 (79 excluded, 101 after)
    # lid 1 (t=50, window [30,50]): none; lid 2: key 2 has no right rows
    assert got == {0: 2, 1: 0, 2: 0}


def test_grouped_quantiles_duckdb_disc_rule():
    import ray.data

    from rify_ray.pipelines.relational import grouped_quantiles

    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a"] * 4 + ["b"] * 5, pa.string()),
                "v": pa.array([4, 1, 3, 2, 50, 10, 30, 20, 40], pa.int64()),
            }
        )
    )
    out = {
        r["k"]: (r["p25"], r["p50"], r["p90"])
        for r in grouped_quantiles(
            ds, key_col="k", value_col="v", qs=[0.25, 0.5, 0.9],
            out_names=["p25", "p50", "p90"],
        ).take_all()
    }
    # DuckDB quantile_disc: element at max(0, ceil(q*n)-1) of sorted vals
    assert out["a"] == (1, 2, 4)
    assert out["b"] == (20, 30, 50)


def test_grouped_quantiles_heavy_key_routes_through_sketch():
    """The automatic heavy-key fallback: a key whose value count
    exceeds heavy_key_bound is detected by the key pre-pass and routed
    through the Munro-Paterson sketch (bounded rank error); light keys
    stay exact; the union covers every key exactly once."""
    import ray.data

    from rify_ray.pipelines.relational import grouped_quantiles

    rng = np.random.default_rng(11)
    n_heavy, n_light = 40_000, 500
    keys = np.concatenate([np.repeat("hot", n_heavy), np.repeat("cold", n_light)])
    vals = np.concatenate(
        [
            rng.normal(5000, 1500, size=n_heavy).astype(np.int64),
            np.arange(n_light, dtype=np.int64),
        ]
    )
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    ).repartition(4)
    rows = grouped_quantiles(
        ds, key_col="k", value_col="v", qs=[0.5, 0.9],
        out_names=["p50", "p90"], heavy_key_bound=10_000,
    ).take_all()
    got = {r["k"]: (r["p50"], r["p90"]) for r in rows}
    assert set(got) == {"hot", "cold"} and len(rows) == 2
    # light key: exact DuckDB disc rule — element at ceil(q*n)-1
    assert got["cold"] == (249, 449)
    # heavy key: sketch estimate within rank-error bound
    sub = np.sort(vals[:n_heavy])
    for est, q in zip(got["hot"], [0.5, 0.9]):
        rank = np.searchsorted(sub, est, side="right")
        assert abs(rank / sub.size - q) < 0.03, (q, rank / sub.size)
    # all keys heavy: pure sketch path still covers every key
    rows2 = grouped_quantiles(
        ds, key_col="k", value_col="v", qs=[0.5], out_names=["p50"],
        heavy_key_bound=100,
    ).take_all()
    assert {r["k"] for r in rows2} == {"hot", "cold"}


def test_grouped_quantiles_heavy_int_key(ray_session=None):
    """Int64 key columns must route through the heavy-key sketch split
    without crashing (the string filter array is built from arrow
    string CASTS of the keys, not raw python values — code-review
    finding, round 5)."""
    import ray.data

    from rify_ray.pipelines.relational import grouped_quantiles

    keys = np.concatenate([np.repeat(42, 3000), np.repeat(7, 100)])
    vals = np.concatenate(
        [np.arange(3000, dtype=np.int64), np.arange(100, dtype=np.int64)]
    )
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    ).repartition(2)
    rows = grouped_quantiles(
        ds, key_col="k", value_col="v", qs=[0.5], out_names=["p50"],
        heavy_key_bound=1000,
    ).take_all()
    got = {r["k"]: r["p50"] for r in rows}
    assert set(got) == {"42", "7"}  # output key col is string-typed
    assert got["7"] == 49  # light key stays exact (ceil(0.5*100)-1)
    sub = np.arange(3000)
    rank = np.searchsorted(sub, got["42"], side="right")
    assert abs(rank / 3000 - 0.5) < 0.05


def test_normalize_fn():
    from rify_ray.stages.text import normalize_fn

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["  Hello\t WORLD  x ", "ok"], pa.string()),
        }
    )
    out = normalize_fn(batch)
    assert out["norm"].to_pylist() == ["hello world x", "ok"]


def test_grouped_apply_driver_matches_shuffle():
    """asof/range/sessionize adaptive grouping: driver path == shuffle
    path (the sessionize oracle already pins values; here we pin branch
    parity for all three grouped operators)."""
    import ray.data

    from rify_ray.pipelines.relational import events_sessionize
    from rify_ray.util import grouped_apply

    sf = "/root/testdata/sf0.001"

    def rows(ds):
        return sorted(tuple(r.values()) for r in ds.take_all())

    assert rows(events_sessionize(sf)) == rows(events_sessionize(sf, forced_shuffle=True))

    # generic: kernel sees identical complete groups on both branches
    tbl = pa.table(
        {
            "k": pa.array([3, 1, 3, 2, 1, 3], pa.int64()),
            "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        }
    )
    ds = ray.data.from_arrow([tbl.slice(0, 3), tbl.slice(3)])
    schema = pa.schema([("k", pa.int64()), ("s", pa.int64())])

    def kern(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pcc

        return pa.table(
            {
                "k": pa.array([group["k"][0].as_py()], pa.int64()),
                "s": pa.array([pcc.sum(group["v"]).as_py()], pa.int64()),
            }
        )

    a = sorted(tuple(r.values()) for r in grouped_apply(ds, "k", kern, schema).take_all())
    b = sorted(
        tuple(r.values())
        for r in grouped_apply(ds, "k", kern, schema, forced_shuffle=True).take_all()
    )
    assert a == b == [(1, 7), (2, 4), (3, 10)]


def test_redact_matches_duckdb_regexp_replace():
    import duckdb

    from rify_ray.stages.corpus import redact

    texts = ["the customer saw a spark", "vectors and vector", "clean", "customers"]
    out = redact(_docs(texts), r"\b(customer|spark|vector)\b", "[X]").take_all()
    got = {r["doc_id"]: r["text"] for r in out}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT regexp_replace(?, '\\b(customer|spark|vector)\\b', '[X]', 'g')",
            [t],
        ).fetchone()[0]
        assert got[i] == want
    # word boundaries: substrings inside longer words survive
    assert got[1] == "vectors and [X]"
    assert got[3] == "customers"


def test_stratified_sample_k_per_stratum_and_deterministic():
    import ray.data

    from rify_ray.stages.corpus import _KNUTH, _KNUTH_MOD, stratified_sample

    n = 60
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
        }
    )

    def run(forced):
        rows = stratified_sample(
            ray.data.from_arrow(tbl),
            strata_col="source",
            key_col="doc_id",
            k=4,
            forced_shuffle=forced,
        ).take_all()
        return sorted((r["source"], r["doc_id"]) for r in rows)

    got = run(False)
    # closed form: per stratum, the 4 ids with smallest (knuth hash, id)
    want = []
    for s in ["s0", "s1", "s2"]:
        ids = [i for i in range(n) if f"s{i % 3}" == s]
        ids.sort(key=lambda i: (i * _KNUTH % _KNUTH_MOD, i))
        want += [(s, i) for i in ids[:4]]
    assert got == sorted(want)
    # both merge branches agree, and sampling is retry-stable
    assert got == run(True) == run(False)


def test_quantile_threshold_duckdb_disc_rule():
    import duckdb
    import ray.data

    from rify_ray.stages.corpus import quantile_threshold

    vals = [5, 1, 9, 1, 7, 3, 3, 3, 8, 2, 11, 4]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    con = duckdb.connect()
    for q in [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]:
        want = con.execute(
            "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)", [q, vals]
        ).fetchone()[0]
        assert quantile_threshold(ds, "v", q) == want, q
    with pytest.raises(ValueError):
        quantile_threshold(ds.filter(lambda r: False), "v", 0.5)


def test_hopping_window_counts_cover_each_event_k_times(tmp_path):
    import pyarrow.parquet as pq

    from rify_ray.pipelines.relational import events_hopping_counts

    # events at 00:10, 01:10, 01:50, 03:30 (+ one other type)
    hours = [0.17, 1.17, 1.83, 3.5]
    ts = pa.array([int(h * 3600 * 1e6) for h in hours] + [int(0.5 * 3600 * 1e6)], pa.int64())
    et = pa.array(["a"] * 4 + ["b"], pa.string())
    pq.write_table(pa.table({"ts": ts, "event_type": et, "event_id": pa.array(range(5), pa.int64())}),
                   str(tmp_path / "events.parquet"))
    rows = events_hopping_counts(str(tmp_path), window_s=7200, hop_s=3600).take_all()
    got = {(r["event_type"], r["window_start"]): r["n_events"] for r in rows}
    # each event lands in exactly window/hop = 2 windows
    assert sum(got.values()) == 2 * 5
    # event at hour 1.17 and 1.83 share windows [3600,10800) and [0,7200)
    assert got[("a", 3600)] == 2
    assert got[("a", 0)] == 3  # events at 0.17, 1.17, 1.83
    assert got[("b", 0)] == 1 and got[("b", -3600)] == 1
    # forced shuffle branch agrees
    rows2 = events_hopping_counts(
        str(tmp_path), window_s=7200, hop_s=3600, forced_shuffle=True
    ).take_all()
    assert got == {(r["event_type"], r["window_start"]): r["n_events"] for r in rows2}


def test_embed_norm_topk_matches_numpy():
    import ray.data

    from rify_ray.stages.similarity import embed_norm_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    # small batch_size → several partial blocks feed the driver merge
    rows = embed_norm_topk(ray.data.from_arrow(tbl), k=6, batch_size=7).take_all()
    ss = (vecs * vecs).sum(axis=1)
    want = list(np.lexsort((np.arange(40), -ss))[:6])
    assert [r["vec_id"] for r in rows] == want
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5, 6]


def test_ngram_decontaminate_overlap_semantics():
    from rify_ray.stages.corpus import ngram_decontaminate

    eval_texts = ["alpha beta gamma delta epsilon zeta"]
    docs = [
        "x y alpha beta gamma delta epsilon q",   # shares the 5-gram → dropped
        "alpha beta gamma delta q r s",           # only a 4-gram overlap → kept
        "completely unrelated words here now ok", # kept
    ]
    out = ngram_decontaminate(_docs(docs), eval_texts, n=5).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 2]
    # n=2: doc 1 shares bigram "alpha beta" → dropped too
    out2 = ngram_decontaminate(_docs(docs), eval_texts, n=2).take_all()
    assert sorted(r["doc_id"] for r in out2) == [2]
    # grams never span document boundaries: "delta epsilon" split across
    # two docs in ONE batch must not be treated as an eval bigram
    out3 = ngram_decontaminate(
        _docs(["c d delta", "epsilon f g"]), ["delta epsilon"], n=2
    ).take_all()
    assert sorted(r["doc_id"] for r in out3) == [0, 1]
    # empty eval set keeps everything
    assert len(ngram_decontaminate(_docs(docs), [], n=5).take_all()) == 3


def test_pack_bins_closed_form():
    import ray.data

    from rify_ray.stages.corpus import pack_bins

    tbl = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 10, 11], pa.int64()),
            "source": pa.array(["a", "a", "a", "b", "b"], pa.string()),
            "n_tokens": pa.array([4, 3, 5, 7, 2], pa.int64()),
        }
    )
    rows = pack_bins(
        ray.data.from_arrow(tbl), capacity=6, strata_col="source",
        key_col="doc_id", token_col="n_tokens",
    ).take_all()
    got = {(r["source"], r["doc_id"]): r["bin"] for r in rows}
    # source a, id order 1,2,3: prefix sums 3,8,12 → starts 0,3,8 → bins 0,0,1
    # source b, id order 10,11: starts 0,7 → bins 0,1
    assert got == {("a", 1): 0, ("a", 2): 0, ("a", 3): 1, ("b", 10): 0, ("b", 11): 1}


def test_bpe_token_count_matches_duckdb():
    import duckdb

    from rify_ray.stages.text import BPE_PRETOKEN_RX, bpe_token_count_fn, text_stage

    texts = ["it's 42 apples, really!", "the fast key order", "  spaced   out ", ""]
    rows = text_stage(_docs(texts), bpe_token_count_fn).take_all()
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in rows}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT length(regexp_extract_all(?, ?))", [t, BPE_PRETOKEN_RX]
        ).fetchone()[0]
        assert got[i] == want, (i, t)


def _winnow_reference(data, k, w):
    """Straight-from-the-paper reference: rolling hashes, rightmost min
    per window of w hashes, distinct sorted selection."""
    B, M = 1000003, (1 << 61) - 1
    n = len(data)
    if n < k:
        return []
    hs = []
    for i in range(n - k + 1):
        h = 0
        for j in range(k):
            h = (h * B + data[i + j]) & M
        hs.append(h)
    if len(hs) <= w:
        return sorted({min(hs)})
    sel = set()
    for s in range(len(hs) - w + 1):
        win = hs[s : s + w]
        m = min(win)
        # rightmost occurrence of the minimum
        sel.add(hs[s + max(i for i, v in enumerate(win) if v == m)])
    return sorted(sel)


def test_winnow_select_matches_reference():
    from rify_ray.stages.text import _winnow_select

    data = b"abracadabra abracadabra yes abracadabra"
    arr = np.frombuffer(data, dtype=np.uint8)
    for k, w in [(3, 4), (4, 5), (2, 8), (5, 50)]:
        got = list(_winnow_select(arr, k, w))
        assert got == _winnow_reference(list(data), k, w), (k, w)


def test_winnow_fingerprint_overlap_property():
    from rify_ray.stages.text import text_stage, winnow_fingerprint_fn

    base = "the quick brown fox jumps over the lazy dog while the band plays on"
    docs = [base, "PREFIX " + base + " SUFFIX", "totally different content here"]
    rows = text_stage(_docs(docs), winnow_fingerprint_fn(k=4, w=5)).take_all()
    by_id = {r["doc_id"]: r for r in rows}
    # identical text → identical digest (deterministic), and a shared
    # long substring → shared selected hashes, so sketch sizes are close
    rows2 = text_stage(_docs(docs), winnow_fingerprint_fn(k=4, w=5)).take_all()
    assert {r["doc_id"]: r["digest"] for r in rows2} == {
        i: by_id[i]["digest"] for i in by_id
    }
    assert by_id[0]["digest"] != by_id[2]["digest"]
    assert by_id[0]["n_selected"] > 0


def test_mp_quantile_sketch_rank_error_and_determinism():
    import ray.data

    from rify_ray.stages.corpus import MPQuantileSketch

    rng = np.random.default_rng(42)
    vals = rng.integers(0, 1_000_000, size=120_000).astype(np.int64)
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    ds = ray.data.from_arrow(tbl)
    sk = MPQuantileSketch.from_dataset(ds, "v", k=256)
    srt = np.sort(vals)
    n = vals.size
    for q in [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
        est = sk.quantile(q)
        # rank error bound: the estimate's true rank must be within 2%
        rank = np.searchsorted(srt, est, side="right")
        assert abs(rank / n - q) < 0.02, (q, rank / n)
    # deterministic (no RNG anywhere): a second pass gives identical output
    sk2 = MPQuantileSketch.from_dataset(ray.data.from_arrow(tbl), "v", k=256)
    assert all(sk.quantile(q) == sk2.quantile(q) for q in [0.25, 0.5, 0.9])
    # constant-state reduction: far fewer values than rows survive per sketch
    total = sum(b.size for b in sk.levels.values())
    assert total < 10_000


def test_grouped_quantile_sketch_close_to_exact():
    import ray.data

    from rify_ray.stages.corpus import grouped_quantile_sketch

    rng = np.random.default_rng(5)
    n = 60_000
    keys = rng.choice(["a", "b", "c"], size=n)
    vals = (rng.normal(5000, 1500, size=n)).astype(np.int64) + np.where(
        keys == "b", 10_000, 0
    )
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    rows = grouped_quantile_sketch(
        ray.data.from_arrow(tbl), key_col="k", value_col="v",
        qs=[0.5, 0.9], out_names=["p50", "p90"], k=256,
    ).take_all()
    got = {r["k"]: (r["p50"], r["p90"]) for r in rows}
    assert set(got) == {"a", "b", "c"}
    for key in "abc":
        sub = np.sort(vals[keys == key])
        for est, q in zip(got[key], [0.5, 0.9]):
            rank = np.searchsorted(sub, est, side="right")
            assert abs(rank / sub.size - q) < 0.03, (key, q, rank / sub.size)


def test_mixture_sample_rates_and_determinism():
    import ray.data

    from rify_ray.stages.corpus import _KNUTH, _KNUTH_MOD, mixture_sample

    n = 300
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
        }
    )
    rates = {"s0": 50, "s1": 10}  # s2 unlisted -> default 0

    def run():
        rows = mixture_sample(
            ray.data.from_arrow(tbl), rates, default_pct=0
        ).take_all()
        return sorted((r["source"], r["doc_id"]) for r in rows)

    got = run()
    want = sorted(
        (f"s{i % 3}", i)
        for i in range(n)
        if (i * _KNUTH % _KNUTH_MOD) % 100 < rates.get(f"s{i % 3}", 0)
    )
    assert got == want
    assert not any(s == "s2" for s, _ in got)
    assert got == run()  # retry-stable


def test_neardup_survivors_keeps_min_per_cluster():
    import ray.data

    from rify_ray.stages.dedup import neardup_survivors

    docs = _docs(["a", "b", "c", "d", "e"])
    # pairs chain 0-1-3 into one cluster; 2 and 4 untouched
    pairs = ray.data.from_arrow(
        pa.table(
            {"id1": pa.array([0, 1], pa.int64()), "id2": pa.array([1, 3], pa.int64())}
        )
    )
    out = neardup_survivors(docs, pairs).take_all()
    assert sorted(r["doc_id"] for r in out) == [0, 2, 4]
    # empty pair set keeps the corpus untouched
    empty = ray.data.from_arrow(
        pa.table({"id1": pa.array([], pa.int64()), "id2": pa.array([], pa.int64())})
    )
    assert len(neardup_survivors(_docs(["x", "y"]), empty).take_all()) == 2


def test_neardup_survivors_left_anti_branch():
    """broadcast_rows=0 pins the Dataset left_anti path with a partition
    count sized to the cluster (a count far above the CPU count would
    starve Ray's join aggregators)."""
    import ray.data

    from rify_ray.stages.dedup import neardup_survivors

    docs = _docs(["a", "b", "c", "d", "e"])
    pairs = ray.data.from_arrow(
        pa.table(
            {"id1": pa.array([0, 1], pa.int64()), "id2": pa.array([1, 3], pa.int64())}
        )
    )
    out = neardup_survivors(docs, pairs, broadcast_rows=0, num_partitions=4).take_all()
    assert sorted(r["doc_id"] for r in out) == [0, 2, 4]


def test_box_thumb_small_image_no_nan():
    """Images narrower/shorter than the 8px thumbnail grid must not
    produce NaN features (empty array_split chunks)."""
    import numpy as np

    from rify_ray.stages.multimodal import _box_thumb

    t = _box_thumb(np.arange(16, dtype=np.float32).reshape(4, 4))
    assert t.shape == (8, 8) and not np.isnan(t).any()
    t2 = _box_thumb(np.ones((1, 1), dtype=np.float32))
    assert t2.shape == (8, 8) and (t2 == 1).all()
