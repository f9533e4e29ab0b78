"""Mini-driver: replays the correctness gate locally.

Runs every __spark_entry__.queries() entry and compares it against its
oracle_sql() twin through DuckDB: row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by all columns). Exact equality for ints/strings/timestamps; floats are
expected to already be ROUNDed inside the queries and compare exactly.

Usage: [SF=sf0.001] [SWEEP_JSON=out.json] python scripts/check_entry.py [query ...]

SWEEP_JSON writes the per-query verdicts as a JSON object — the
committed SWEEP_r{N}.json artifact that proves every registered query
(not just the driver's bounded gate window) green in the same round.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SF", "sf0.001")
SF_DIR = f"/root/testdata/{SF}"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"schema {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}")
        return problems
    if problems:
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.array_equal(av, bv, equal_nan=True)
        else:
            ok = (pd.isna(av) == pd.isna(bv)).all() and (
                (pd.isna(av)) | (av == bv)
            ).all()
        if not ok:
            idx = next(
                i
                for i in range(len(av))
                if not (
                    (pd.isna(av[i]) and pd.isna(bv[i]))
                    or (not pd.isna(av[i]) and not pd.isna(bv[i]) and av[i] == bv[i])
                )
            )
            problems.append(f"col '{c}' differs at sorted row {idx}: {av[idx]!r} vs {bv[idx]!r}")
    return problems


def main():
    only = set(sys.argv[1:])
    from renkodf_spark.session import build_session

    spark = build_session("check-entry", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    import __spark_entry__ as entrymod

    e = entrymod.entry(spark)
    n = e.count()
    print(f"entry(): {n} rows, schema ok")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    report: dict[str, dict] = {}
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, SF_DIR).toPandas()
        except Exception as ex:
            failures.append(name)
            report[name] = {"status": "fail", "detail": f"spark {type(ex).__name__}"}
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {str(ex)[:200]}")
            continue
        if name not in oracles:
            rows_only += 1
            report[name] = {"status": "rows_only", "rows": len(sdf), "sec": round(time.time() - t0, 1)}
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            report[name] = {"status": "fail", "detail": f"duckdb {str(ex)[:120]}"}
            print(f"FAIL  {name}: duckdb error {str(ex)[:200]}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures.append(name)
            report[name] = {"status": "fail", "detail": "; ".join(problems)[:200]}
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            passed += 1
            report[name] = {"status": "ok", "rows": len(sdf), "sec": round(time.time() - t0, 1)}
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{passed} oracle-matched, {rows_only} rows-only, {len(failures)} failed")
    out_path = os.environ.get("SWEEP_JSON")
    if out_path:
        payload = {
            "sf": SF,
            "entry_rows": n,
            # a name-filtered run is NOT a full-registry sweep; record
            # the filter so a partial artifact can't pass as exhaustive
            "filter": sorted(only) if only else None,
            "registry_size": len(qs),
            "summary": {"ok": passed, "rows_only": rows_only, "failed": len(failures)},
            "queries": report,
        }
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"wrote {out_path}")
    if failures:
        print("failed:", ", ".join(failures))
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
