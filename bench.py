#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...extras}

``--scaling`` runs the headline KG pipeline at two CPU levels (N and 4N,
default 2 and 8; GRAFT_SCALING_LEVELS overrides) in FRESH processes on
the same input, median of 3 runs per level, and reports throughput at
both plus scaling efficiency — the sandbox stand-in for the N vs 4N
node-count criterion in BASELINE.json.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from typing import Sequence

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else 0.1


SF = _sf_from_dir(SF_DIR)
# pages scale with sf: sf0.1 → 20k pages (~3.5 KB html each) over 500
# entities; scaling children run 4× the pages so the map stages dominate
# fixed overheads and the 8→32 CPU comparison measures real compute
N_PAGES = max(200, int(200_000 * SF))
if os.environ.get("GRAFT_SCALING_CHILD"):
    # scaling children need enough parallel compute (minutes single-core)
    # to dominate the job's fixed components: Ray per-stage overheads
    # (~5 s) AND the entity-bound fixpoint tail (~8 s — the 500-entity
    # closure is the same size whatever the page count, exactly like a
    # fixed-size ontology against a growing crawl)
    N_PAGES *= 288
if os.environ.get("GRAFT_PAGES_OVERRIDE"):
    N_PAGES = int(os.environ["GRAFT_PAGES_OVERRIDE"])
M_ENTITIES = 500

# N vs 4N CPU levels for --scaling.  2 and 8 (not 8/32): this host's 32
# hardware threads are 16 physical cores x2 SMT with shared memory
# bandwidth — 16+ workers on string-heavy batches are bandwidth-bound,
# capping even perfectly-parallel code well below 4x wall-clock.  2→8
# runs both levels on distinct, unsaturated physical cores, measuring
# the SOFTWARE's scaling, which is the criterion.
SCALING_LEVELS = tuple(int(x) for x in os.environ.get("GRAFT_SCALING_LEVELS", "2,8").split(","))


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # explicit session tuning (was an accidental process-wide side effect
    # of util.distinct before round 2): shuffle/aggregate/join aggregator
    # actors reserve CPU/2 by default and starve concurrent map stages
    from rify_ray.util import tune_data_context

    tune_data_context()
    # spin the worker pool once before any timed query: the first
    # map_batches of a fresh Ray session pays ~2 s of worker-process
    # startup + module import that a long-lived cluster never sees —
    # excluded from per-query times, included in the process wall time.
    # The warm fn imports the same modules the real stages use, so the
    # pool is warm the way a long-lived cluster's pool is warm.
    import ray.data

    ray.data.range(num_cpus, override_num_blocks=num_cpus).map_batches(
        _warm_worker, batch_format="pyarrow"
    ).materialize()


def _warm_worker(batch):
    import numpy  # noqa: F401
    import polars  # noqa: F401
    import pyarrow.compute  # noqa: F401

    import rify_ray.eval_shuffle  # noqa: F401
    import rify_ray.stages.dedup  # noqa: F401
    import rify_ray.stages.text  # noqa: F401

    return batch


def bench_kg_pages(num_cpus: int) -> dict:
    """Headline: pages → extract → link → canonicalize → dedup →
    store-resident (parquet-generation) fixpoint ancestor closure — the
    100 TB path end to end; triples never land on the driver."""
    import tempfile

    from rify_ray.pipelines.kg import kg_construct_and_infer_store
    from rify_ray.sources import pages_dataset
    from rify_ray.model import Rule
    from rify_ray import B, U

    rules = [
        Rule.create(
            [[U("a"), B("parent"), U("b"), B("default_graph")]],
            [[U("a"), B("ancestor"), U("b"), B("default_graph")]],
        ),
        Rule.create(
            [
                [U("a"), B("ancestor"), U("b"), B("default_graph")],
                [U("b"), B("ancestor"), U("c"), B("default_graph")],
            ],
            [[U("a"), B("ancestor"), U("c"), B("default_graph")]],
        ),
    ]
    t0 = time.monotonic()
    with tempfile.TemporaryDirectory() as d:
        store = kg_construct_and_infer_store(
            pages_dataset(
                N_PAGES,
                M_ENTITIES,
                override_num_blocks=num_cpus * 8,
                include_golden=False,  # extraction recomputes it; halves gen bytes
            ),
            rules,
            M_ENTITIES,
            f"{d}/kg",
            concurrency=max(2, num_cpus // 2),
        )
        n_derived = sum(g["rows"] for g in store.generations[1:])
        dt = time.monotonic() - t0
    return {
        "sec": dt,
        "pages": N_PAGES,
        "derived_triples": n_derived,
        "pages_per_sec": N_PAGES / dt,
        "triples_per_sec": n_derived / dt,
    }


def run_queries() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    picks = [
        "kg_customer_region",
        "kg_conational",
        "kg_conational_store",
        "kg_nation_chain_closure",
        "kg_customer_region_incr",
        "kg_customer_region_retract",
        "kg_conational_retract",
        "kg_prove_chain",
        "kg_bgp_customer_region",
        "kg_bgp_store",
        "kg_bgp_filtered",
        "kg_bgp_filtered_store",
        "kg_predicate_stats",
        "kg_top_out_degree",
        "dedup_exact_docs",
        "docs_incremental_dedup",
        "docs_cooccur_top20",
        "docs_vocab",
        "text_token_counts",
        "text_lang_id",
        "text_fingerprint",
        "text_quality",
        "text_repetition",
        "text_bpe_token_counts",
        "docs_stable_sample",
        "docs_decontaminate",
        "docs_redact",
        "docs_stratified_sample",
        "docs_quality_filter",
        "docs_ngram_decontaminate",
        "docs_bloom_decontaminate",
        "docs_pack_bins",
        "text_winnow_fp",
        "ngram_top20",
        "docs_mixture_sample",
        "source_stats",
        "events_window_counts",
        "events_hopping_counts",
        "events_value_p50_sketch",
        "events_asof_prior_purchase",
        "events_range_purchases_24h",
        "events_value_quantiles",
        "events_distinct_users",
        "docs_topk_per_source",
        "docs_tfidf_top5",
        "docs_postings_index",
        "docs_per_source_cap",
        "events_sessionize",
        "events_funnel",
        "events_retention",
        "docs_jsonl_roundtrip",
        "top_users_by_events",
        "segment_order_counts",
        "lineitem_pricing_cents",
        "revenue_by_nation",
        "orders_rollup",
        "events_type_pivot",
        "events_user_running",
        "knn_cosine_top5",
        "knn_lsh_top3",
        "embed_norm_top10",
        "minhash_candidates",
        "minhash_verified",
        "dedup_ngram_jaccard",
        "simhash_neardup",
        "embed_neardup",
        "multimodal_decode",
    ]
    out = {}
    for name in picks:
        t0 = time.monotonic()
        qs[name](SF_DIR)
        out[name] = round(time.monotonic() - t0, 3)
        if name == "kg_conational_retract":
            # the maintenance cost separated from the closure build the
            # callable necessarily runs first (sublinearity evidence:
            # retract writes scale with the deleted cone via tombstones)
            for k, v in entrymod._LAST_RETRACT_TIMES.items():
                if k == "retracted":
                    continue
                out[f"kg_conational_retract::{k}"] = round(float(v), 3)
    return out


def main() -> None:
    _init_ray(NUM_CPUS)
    queries = {}
    kg = bench_kg_pages(NUM_CPUS)
    queries["kg_pages_flagship"] = round(kg["sec"], 3)
    queries.update(run_queries())
    # "::" entries are phase breakdowns of a query already counted
    total = round(sum(v for k, v in queries.items() if "::" not in k), 3)
    payload = {
        "metric": "kg-construct+fixpoint+training-data ops wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF,
        "num_cpus": NUM_CPUS,
        "pages": kg["pages"],
        "derived_triples": kg["derived_triples"],
        "pages_per_sec": round(kg["pages_per_sec"], 1),
        "triples_per_sec": round(kg["triples_per_sec"], 1),
    }
    # full detail (3-decimal times + the :: phase breakdowns) goes to a
    # repo file; stdout carries a COMPACT single line (2-decimal, no ::
    # keys, no separator padding) — the harness that captures it keeps
    # only the last 2000 characters, and the full dict no longer fits
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SELF.json"), "w") as f:
        json.dump(payload, f, indent=1)
    compact = dict(payload)
    compact["metric"] = "kg+ops wall time"  # full label in BENCH_SELF.json
    compact["queries"] = {
        k: round(v, 2) for k, v in queries.items() if "::" not in k
    }
    print(json.dumps(compact, separators=(",", ":")))
    import ray

    ray.shutdown()


def child(num_cpus: int) -> None:
    """--scaling child: run ONLY the headline KG pipeline."""
    _init_ray(num_cpus)
    r = bench_kg_pages(num_cpus)
    print("CHILD_RESULT " + json.dumps(r))
    import ray

    ray.shutdown()


def _run_child(n: int) -> dict:
    env = dict(os.environ)
    # the child simulates an n-core cluster: cap BOTH Ray slots and
    # the driver-side polars threadpool
    env["POLARS_MAX_THREADS"] = str(n)
    env["GRAFT_SCALING_CHILD"] = "1"
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", str(n)],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("CHILD_RESULT ")]
    if not line:
        print(json.dumps({"error": "child failed", "stderr": p.stderr[-2000:]}))
        sys.exit(1)
    return json.loads(line[-1][len("CHILD_RESULT "):])


def scaling(repeat: int = 3) -> None:
    """Median-of-``repeat`` fresh-process runs per CPU level: single runs
    on this shared host vary ±20%, so one sample under- or over-states
    the software's scaling.  With more than two levels, every adjacent
    pair's efficiency is reported (e.g. levels 2,8,32 → 2→8 AND 8→32,
    full transparency on the SMT/bandwidth-confounded upper pair); the
    headline `value` is the first pair — the N→4N criterion measured on
    distinct, unsaturated physical cores."""
    import statistics

    runs: dict = {n: [] for n in SCALING_LEVELS}
    for _ in range(repeat):
        for n in SCALING_LEVELS:
            runs[n].append(_run_child(n))
    med = {n: statistics.median(r["sec"] for r in runs[n]) for n in SCALING_LEVELS}
    pairs = {}
    for lo, hi in zip(SCALING_LEVELS, SCALING_LEVELS[1:]):
        speedup = med[lo] / med[hi]
        pairs[f"{lo}->{hi}"] = {
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / (hi / lo), 3),
        }
    lo, hi = SCALING_LEVELS[0], SCALING_LEVELS[1]
    out = {
        "metric": f"scaling efficiency (num_cpus {lo} -> {hi}, fresh processes, median of {repeat})",
        "value": pairs[f"{lo}->{hi}"]["efficiency"],
        "unit": "efficiency",
        "sf": SF,
        "pages": runs[lo][0]["pages"],
        "pairs": pairs,
    }
    for n in SCALING_LEVELS:
        out[f"sec_at_{n}"] = round(med[n], 3)
        out[f"all_sec_at_{n}"] = [round(r["sec"], 2) for r in runs[n]]
        out[f"pages_per_sec_at_{n}"] = round(runs[n][0]["pages"] / med[n], 1)
    print(json.dumps(out))


def full_levels(levels: Sequence[int] = (8, 32)) -> None:
    """--full-levels: the ENTIRE bench suite at two CPU levels in fresh
    processes, so per-query regressions across rounds are visible at
    both parallelism levels (not just the flagship scaling child)."""
    results = {}
    for n in levels:
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(n)
        env["POLARS_MAX_THREADS"] = str(n)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True,
            text=True,
            env=env,
            timeout=3600,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(json.dumps({"error": f"level {n} failed", "stderr": p.stderr[-2000:]}))
            sys.exit(1)
        results[str(n)] = json.loads(lines[-1])
    lo, hi = (str(x) for x in levels[:2])
    print(
        json.dumps(
            {
                "metric": f"full bench at num_cpus {lo} and {hi} (fresh processes)",
                "value": results[hi]["value"],
                "unit": "sec",
                "sf": results[hi]["sf"],
                "levels": {
                    k: {"value": v["value"], "queries": v["queries"]}
                    for k, v in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        scaling()
    elif len(sys.argv) > 1 and sys.argv[1] == "--full-levels":
        lv = (
            tuple(int(x) for x in sys.argv[2].split(","))
            if len(sys.argv) > 2
            else (8, 32)
        )
        full_levels(lv)
    elif len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
