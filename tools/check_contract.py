"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet, compares row count and
order-insensitive values (columns sorted by name, rows sorted by all
columns). Exit code 1 on any mismatch.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(a: pd.DataFrame, b: pd.DataFrame, name: str) -> list[str]:
    issues = []
    if len(a) != len(b):
        return [f"{name}: row count {len(a)} != {len(b)}"]
    if sorted(a.columns) != sorted(b.columns):
        return [f"{name}: columns {sorted(a.columns)} != {sorted(b.columns)}"]
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = (
                (av.isna() & bv.isna())
                | (av == bv)
                | (np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
            )
        else:
            ok = av.eq(bv) | (av.isna() & bv.isna())
        if not ok.all():
            bad = (~ok).idxmax()
            issues.append(
                f"{name}.{c}: {int((~ok).sum())} mismatches, e.g. row {bad}: "
                f"{av[bad]!r} != {bv[bad]!r}"
            )
    return issues


def main() -> int:
    import __spark_entry__ as entrymod
    from spatialpandas_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # multi-file fact tables (tools/make_scale.py round 13) are a
        # DIRECTORY of part files; the driver's own sf dirs stay single
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: SPARK ERROR {exc}")
            print(f"FAIL {name}: spark error {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(sdf)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: ORACLE ERROR {exc}")
            print(f"FAIL {name}: oracle error {exc}")
            continue
        issues = compare(sdf, odf, name)
        if issues:
            failures.extend(issues)
            for i in issues:
                print(f"FAIL {i}")
        else:
            print(f"ok   {name}: rows={len(sdf)} MATCH [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
