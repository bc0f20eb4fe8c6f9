"""Parity-check a NOT-YET-REGISTERED wave module against DuckDB — the
same row/column/value-hash compare as tools/parity.py, but reading the
module's ``REGISTRY_EXT*`` dict directly so new waves can be verified
BEFORE the registry edit (the round-6 sequencing rule: never touch
registry.py while a full pytest run is in flight). Usage:

    python tools/parity_module.py <module> [sf_dir] [query ...]
    # e.g. python tools/parity_module.py registry_ext127 /root/testdata/sf0.01
"""

from __future__ import annotations

import importlib
import sys
import time


def main() -> int:
    mod_name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    only = set(sys.argv[3:])

    sys.path.insert(0, ".")
    from tools.parity import duck_con, value_hash

    mod = importlib.import_module(f"etl_poor_main_pipeline_spark.{mod_name}")
    reg = next(
        v for k, v in vars(mod).items() if k.startswith("REGISTRY_EXT")
    )
    from etl_poor_main_pipeline_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    n_pass = n_fail = 0
    for name, spec in reg.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {str(e)[:400]}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s)")
            n_pass += 1
            continue
        try:
            rel = con.sql(spec.oracle)
            bad_types = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT")
                or str(t).upper().startswith("DECIMAL")
            ]
            odf = rel.fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {str(e)[:400]}")
            n_fail += 1
            continue
        problems = []
        if bad_types:
            problems.append(
                f"oracle output type(s) {bad_types} — cast to ::BIGINT/double"
            )
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems and len(sdf) == len(odf):
                from tools.parity import normalize

                a, b = normalize(sdf), normalize(odf)
                key = sorted(a.columns)
                a = a.sort_values(key).reset_index(drop=True)
                b = b.sort_values(key).reset_index(drop=True)
                diff = (a != b) & ~(a.isna() & b.isna())
                bad = diff.any(axis=1)
                print(a[bad].head(3).to_string())
                print(b[bad].head(3).to_string())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, spark {t_spark:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
