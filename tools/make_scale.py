"""Synthesize a larger scale factor for the scale rehearsal by
replicating the driver-generated sf0.1 tables with per-replica key
offsets (each replica is a disjoint key universe, so every join/gate
semantics is preserved — dims region/nation/supplier/part stay single).

This data is for SCALE-STABILITY rehearsal only (tools/check_contract.py
against the same parquet on both engines); the driver's own sf dirs stay
the only correctness inputs of record.

Usage: python tools/make_scale.py [factor] [src_sf_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 .scale/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else ".scale/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def copy(sql: str, name: str, multi: bool = False) -> None:
        # Fact tables are written MULTI-FILE (round 13, b11/b5 sf1
        # forensics): a single ~115 MB parquet file is below Spark's
        # 128 MB maxPartitionBytes, so every scan of it is ONE task —
        # the r12 battery's +58%/+62% sjoin "regressions" were this
        # serialized scan, not a plan shift. Real 100 TB tables are
        # thousands of files; the rehearsal layout should be too.
        # Dims stay single-file (tiny, broadcast anyway).
        if multi:
            con.execute(
                f"COPY ({sql}) TO '{out}/{name}.parquet' "
                f"(FORMAT parquet, FILE_SIZE_BYTES '12MB', "
                f"OVERWRITE_OR_IGNORE true)"
            )
            src_glob = f"'{out}/{name}.parquet/*.parquet'"
        else:
            con.execute(
                f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT parquet)"
            )
            src_glob = f"'{out}/{name}.parquet'"
        n = con.sql(
            f"SELECT COUNT(*) FROM read_parquet({src_glob})"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    def t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    def offset(name: str, key: str) -> int:
        return con.sql(f"SELECT MAX({key}) + 1 FROM {t(name)}").fetchone()[0]

    # dims: single copy
    for dim in ("region", "nation", "supplier", "part"):
        copy(f"SELECT * FROM {t(dim)}", dim)

    ck = offset("customer", "c_custkey")
    ok = offset("orders", "o_orderkey")
    dk = offset("documents", "doc_id")
    vk = offset("embeddings", "vec_id")
    ek = offset("events", "event_id")
    rep = f"range({factor}) rep(r)"

    copy(
        f"SELECT c_custkey + r * {ck} AS c_custkey, "
        f"COLUMNS(* EXCLUDE c_custkey) FROM {t('customer')}, {rep}",
        "customer",
        multi=True,
    )
    copy(
        f"SELECT o_orderkey + r * {ok} AS o_orderkey, "
        f"o_custkey + r * {ck} AS o_custkey, "
        f"COLUMNS(* EXCLUDE (o_orderkey, o_custkey)) "
        f"FROM {t('orders')}, {rep}",
        "orders",
        multi=True,
    )
    copy(
        f"SELECT l_orderkey + r * {ok} AS l_orderkey, "
        f"COLUMNS(* EXCLUDE l_orderkey) FROM {t('lineitem')}, {rep}",
        "lineitem",
        multi=True,
    )
    copy(
        f"SELECT doc_id + r * {dk} AS doc_id, "
        f"COLUMNS(* EXCLUDE doc_id) FROM {t('documents')}, {rep}",
        "documents",
        multi=True,
    )
    copy(
        f"SELECT vec_id + r * {vk} AS vec_id, "
        f"COLUMNS(* EXCLUDE vec_id) FROM {t('embeddings')}, {rep}",
        "embeddings",
        multi=True,
    )
    copy(
        f"SELECT event_id + r * {ek} AS event_id, "
        f"COLUMNS(* EXCLUDE event_id) FROM {t('events')}, {rep}",
        "events",
        multi=True,
    )
    print("done:", out)


if __name__ == "__main__":
    main()
