"""Scale-crossover measurement: single-node numpy proxy vs this engine on
IDENTICAL parquet inputs at growing scale.

Motivation (BASELINE.md): at sf0.1 (~600k rows) any single-node vectorized
baseline beats any distributed engine, because Spark pays a fixed
~0.3-0.5 s/job scheduling + Arrow cost. That fixed cost is irrelevant at
the 100 TB design target; what matters is the *marginal per-row* cost and
where the curves cross. This harness materializes the same point/polygon
workload at Nx the sf0.1 row count (multi-row-group parquet, so Spark's
scan splits naturally — no repartition hacks), runs the numpy proxy and
the Spark engine on the same files, and prints one JSON line with
seconds per (engine, query, scale).

Queries (subset of BASELINE.md's B-set exercising the geometry kernels):
  cx      B1  bbox viewport count
  area    B2  diamond-with-hole signed area sum
  length  B3  perimeter sum
  sjoin   B5  25 diamonds x points point-in-polygon count
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_CROSSOVER_DIR", "/tmp/spatial_crossover")
SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_CROSSOVER_SCALES", "1,8,64"
).split(",")]
REPS = 3


def build_inputs() -> dict[int, str]:
    """Materialize (id, x, y, r) parquet at each scale, 256k-row row groups."""
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )
    ids = (
        li["l_orderkey"].to_numpy() * 10 + li["l_linenumber"].to_numpy()
    ).astype(np.int64)
    x = (li["l_partkey"].to_numpy() % 500).astype(np.float64)
    y = (li["l_suppkey"].to_numpy() % 500).astype(np.float64)
    r = (li["l_linenumber"].to_numpy() % 5 + 1).astype(np.float64)
    os.makedirs(WORK, exist_ok=True)
    paths = {}
    for n in SCALES:
        path = os.path.join(WORK, f"geo_x{n}.parquet")
        paths[n] = path
        if os.path.exists(path):
            continue
        reps = [
            pa.table(
                {
                    "id": ids + k * len(ids),
                    "x": x,
                    "y": y,
                    "r": r,
                }
            )
            for k in range(n)
        ]
        pq.write_table(pa.concat_tables(reps), path, row_group_size=262144)
    return paths


# ------------------------------------------------------------------ numpy
def _load(path):
    t = pq.read_table(path, columns=["x", "y", "r"])
    return t["x"].to_numpy(), t["y"].to_numpy(), t["r"].to_numpy()


def np_cx(path) -> int:
    x, y, _ = _load(path)
    return int(((x >= 100) & (x <= 150) & (y >= 100) & (y <= 150)).sum())


def _rings(x, y, rr):
    sx = np.stack([x + rr, x, x - rr, x, x + rr], axis=1)
    sy = np.stack([y, y + rr, y, y - rr, y], axis=1)
    h = rr / 2
    hx = np.stack([x + h, x, x - h, x, x + h], axis=1)
    hy = np.stack([y, y - h, y, y + h, y], axis=1)
    return sx, sy, hx, hy


def np_area(path) -> float:
    x, y, rr = _load(path)
    sx, sy, hx, hy = _rings(x, y, rr)

    def shoe(xs, ys):
        return 0.5 * np.sum(xs[:, :-1] * ys[:, 1:] - xs[:, 1:] * ys[:, :-1], axis=1)

    return float(np.sum(shoe(sx, sy)) + np.sum(shoe(hx, hy)))


def np_length(path) -> float:
    x, y, rr = _load(path)
    sx, sy, hx, hy = _rings(x, y, rr)

    def ln(xs, ys):
        return np.sum(np.hypot(np.diff(xs, axis=1), np.diff(ys, axis=1)), axis=1)

    return float(np.sum(ln(sx, sy)) + np.sum(ln(hx, hy)))


def np_sjoin(path) -> int:
    px, py, _ = _load(path)
    total = 0
    rr = 25.5
    for k in range(25):
        cx, cy = k * 17 + 30.0, k * 13 + 40.0
        cand = (px >= cx - rr) & (px <= cx + rr) & (py >= cy - rr) & (py <= cy + rr)
        qx, qy = px[cand], py[cand]
        vx = np.array([cx + rr, cx, cx - rr, cx, cx + rr])
        vy = np.array([cy, cy + rr, cy, cy - rr, cy])
        inside = np.zeros(len(qx), dtype=bool)
        on_edge = np.zeros(len(qx), dtype=bool)
        for i in range(4):
            x1, y1, x2, y2 = vx[i], vy[i], vx[i + 1], vy[i + 1]
            cond = (y1 > qy) != (y2 > qy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1 + (qy - y1) * (x2 - x1) / (y2 - y1)
            inside ^= cond & (qx < xint)
            cross = (x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1)
            on_edge |= (
                (np.abs(cross) < 1e-12)
                & (qx >= min(x1, x2)) & (qx <= max(x1, x2))
                & (qy >= min(y1, y2)) & (qy <= max(y1, y2))
            )
        total += int((inside | on_edge).sum())
    return total


# ------------------------------------------------------------------ spark
def sp_points(spark, path):
    from pyspark.sql import functions as F

    from spatialpandas_spark import st_point

    return spark.read.parquet(path).select(
        "id", st_point(F.col("x"), F.col("y")).alias("geom")
    )


def sp_polys(spark, path):
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    cx, cy, r = F.col("x"), F.col("y"), F.col("r")
    h = r / 2
    shell = F.array(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)
    hole = F.array(cx + h, cy, cx, cy - h, cx - h, cy, cx, cy + h, cx + h, cy)
    return df.select("id", F.array(shell, hole).alias("geom"))


def sp_cx(spark, path) -> int:
    from spatialpandas_spark import cx_filter, with_bounds

    pts = with_bounds(sp_points(spark, path), "geom", "point")
    return cx_filter(pts, "geom", "point", (100.0, 100.0, 150.0, 150.0)).count()


def sp_area(spark, path) -> float:
    from pyspark.sql import functions as F

    from spatialpandas_spark.functions.arrow_kernels import with_measures

    return (
        with_measures(sp_polys(spark, path), "geom", "polygon", area="a")
        .agg(F.sum("a"))
        .first()[0]
    )


def sp_length(spark, path) -> float:
    from pyspark.sql import functions as F

    from spatialpandas_spark.functions.arrow_kernels import with_measures

    return (
        with_measures(sp_polys(spark, path), "geom", "polygon", length="l")
        .agg(F.sum("l"))
        .first()[0]
    )


def sp_sjoin(spark, path) -> int:
    from pyspark.sql import functions as F

    from spatialpandas_spark import sjoin, st_make_diamond

    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    dia = nation.select(
        F.col("n_nationkey").alias("did"),
        st_make_diamond(
            (F.col("n_nationkey") * 17 + 30).cast("double"),
            (F.col("n_nationkey") * 13 + 40).cast("double"),
            F.lit(25.5),
        ).alias("poly"),
    )
    return sjoin(
        sp_points(spark, path), dia,
        left_geom="geom", right_geom="poly",
        left_type="point", right_type="polygon", how="inner",
    ).count()


NP_QUERIES = {"cx": np_cx, "area": np_area, "length": np_length, "sjoin": np_sjoin}
SP_QUERIES = {"cx": sp_cx, "area": sp_area, "length": sp_length, "sjoin": sp_sjoin}


def _median_time(fn, *args) -> tuple[float, object]:
    val = fn(*args)  # warm-up
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        fn(*args)
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 3), val


def main() -> None:
    paths = build_inputs()
    out: dict[str, dict] = {"rows_x1": None, "numpy": {}, "spark": {}}

    for n, path in paths.items():
        for q, fn in NP_QUERIES.items():
            sec, val = _median_time(fn, path)
            out["numpy"].setdefault(q, {})[str(n)] = sec
            out.setdefault("values", {}).setdefault(q, {})[f"np_x{n}"] = (
                val if isinstance(val, int) else round(val, 3)
            )

    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="crossover")
    spark.sparkContext.setLogLevel("ERROR")
    for n, path in paths.items():
        for q, fn in SP_QUERIES.items():
            sec, val = _median_time(fn, spark, path)
            out["spark"].setdefault(q, {})[str(n)] = sec
            out["values"][q][f"sp_x{n}"] = (
                val if isinstance(val, int) else round(val, 3)
            )
    out["rows_x1"] = pq.read_metadata(paths[SCALES[0]]).num_rows
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
