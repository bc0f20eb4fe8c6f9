"""Round-13 conf A/B: measure candidate session-conf deltas for the
small-input posture over a representative query subset, warm session.

Usage: python tools/conf_ab.py [sf_dir] [--reps N]

For each variant (a dict of confs applied ON TOP of the execution
posture), runs every query in SUBSET twice (min reported) and prints a
table plus a JSON line. Variants restore confs after each query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# spread over the ledger mass: heavy head, mid-tail stat, text, tpch,
# window/prefix, streaming excluded (drain machinery, measured separately)
SUBSET = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_star_join",
    "text_tf_idf",
    "sessionization_gap30m",
    "flagship_silver_shape",
    "blomqvist_beta",
    "bootstrap_ci_hashed",
    "bws_test",
    "rfm_segmentation",
    "trigram_like_index",
    "grouped_weighted_median",
    "fligner_killeen_test",
    "hoeffding_d",
    "kmv_set_ops",
    "shapley_attribution",
    "gini_gain_split",
    "lorenz_value_deciles",
    "dixon_q_extremes",
    "cohens_kappa",
    "interval_overlap_months",
    "union_all",
    "window_lag_lead",
    "filter_eq",
    "case_bucket_totality",
]

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "no_wsc": {"spark.sql.codegen.wholeStage": "false"},
    "no_codegen": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    },
}


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]

    from etl_poor_main_pipeline_spark.fastpath import execution_posture
    from etl_poor_main_pipeline_spark.registry import queries
    from etl_poor_main_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="conf_ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    # warm-up
    qs["flagship_silver_shape"](spark, sf_dir).count()
    from etl_poor_main_pipeline_spark.sources.read import load_table

    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    results: dict[str, dict[str, float]] = {v: {} for v in VARIANTS}
    # interleave variants per query so host drift hits all variants equally
    for name in SUBSET:
        if name not in qs:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        fn = qs[name]
        for vname, confs in VARIANTS.items():
            prev = {k: spark.conf.get(k, None) for k in confs}
            try:
                for k, v in confs.items():
                    spark.conf.set(k, v)
                walls = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    with execution_posture(spark, sf_dir, name):
                        fn(spark, sf_dir).count()
                    walls.append(time.perf_counter() - t0)
                results[vname][name] = round(min(walls), 3)
            except Exception as exc:
                print(f"{name} [{vname}] FAILED: {exc}", file=sys.stderr)
                results[vname][name] = -1.0
            finally:
                for k, v in prev.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
        row = "  ".join(
            f"{v}={results[v].get(name, float('nan')):6.3f}" for v in VARIANTS
        )
        print(f"{name:34s} {row}", file=sys.stderr)

    for vname in VARIANTS:
        ok = [t for t in results[vname].values() if t >= 0]
        print(
            f"TOTAL {vname:10s} {sum(ok):7.2f}s over {len(ok)} queries",
            file=sys.stderr,
        )
    print(json.dumps(results, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
