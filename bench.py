"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Maps to BASELINE.md's query set B1-B7 (reference spatialpandas operations)
plus the beyond-reference pipeline operators. Protocol per BASELINE.md
(round 12): one session-machinery warm-up, then per query 2 warm-ups +
3 timed runs in-suite (5 timed isolated), median reported. Prints ONE
JSON line.

Geometry is derived from the lineitem table (~600k rows at sf0.1) so the
spatial kernels are exercised at the full row count.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the bench inputs are MB-scale single files; split small so the scan
# parallelizes (the library default is the production 128m)
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")


def _sf() -> float:
    base = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _spread(df):
    """The sf0.1 lineitem file has a single 600k-row row group, so the scan
    is one task no matter the split config. Real datasets at scale have
    thousands of row groups; one cheap repartition here restores the
    parallelism the layout would naturally give."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def make_points(spark, spread=True):
    """~600k points with integer-grid coords derived from lineitem."""
    from spatialpandas_spark import st_point

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    if spread:
        li = _spread(li)
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        st_point(
            (F.col("l_partkey") % 500).cast("double"),
            (F.col("l_suppkey") % 500).cast("double"),
        ).alias("geom"),
    )


def make_polys(spark):
    """~600k diamond polygons with a hole ring each."""
    li = _spread(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"))
    cx = (F.col("l_partkey") % 500).cast("double")
    cy = (F.col("l_suppkey") % 500).cast("double")
    r = (F.col("l_linenumber") % 5 + 1).cast("double")
    h = r / 2
    shell = F.array(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)
    hole = F.array(cx + h, cy, cx, cy - h, cx - h, cy, cx, cy + h, cx + h, cy)
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.array(shell, hole).alias("geom"),
    )


def b1_cx(spark):
    from spatialpandas_spark import cx_filter, with_bounds

    pts = with_bounds(make_points(spark), "geom", "point")
    # viewport covering ~1% of the 500x500 extent
    return cx_filter(pts, "geom", "point", (100.0, 100.0, 150.0, 150.0)).count()


def b2_area_sum(spark):
    from spatialpandas_spark.functions.arrow_kernels import with_measures

    return (
        with_measures(make_polys(spark), "geom", "polygon", area="a")
        .agg(F.sum("a"))
        .first()[0]
    )


def b3_length(spark):
    from spatialpandas_spark.functions.arrow_kernels import with_measures

    return (
        with_measures(make_polys(spark), "geom", "polygon", length="l")
        .agg(F.sum("l"))
        .first()[0]
    )


def b4_bounds(spark):
    from spatialpandas_spark.functions.arrow_kernels import with_measures

    return (
        with_measures(make_polys(spark), "geom", "polygon", bounds="b")
        .agg(F.sum(F.col("b.x0") + F.col("b.y1")))
        .first()[0]
    )


def b5_sjoin(spark):
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
    j = sjoin(
        make_points(spark),
        dia,
        left_geom="geom",
        right_geom="poly",
        left_type="point",
        right_type="polygon",
        how="inner",
    )
    return j.count()


def b6_pack_io(spark):
    from spatialpandas_spark import with_bounds
    from spatialpandas_spark.sources import read_spatial_parquet, write_spatial_parquet

    # no pre-repartition: the pack's repartitionByRange is the ONLY shuffle
    # (round-1 verdict — callers at scale must never pre-spread), and the
    # known extent skips the total-bounds scan job.
    pts = with_bounds(make_points(spark, spread=False), "geom", "point")
    td = tempfile.mkdtemp(prefix="bench_pack_")
    try:
        path = os.path.join(td, "pts")
        write_spatial_parquet(
            pts, path, npartitions=16, p=10, total_bounds=(0.0, 0.0, 499.0, 499.0)
        )
        pruned = read_spatial_parquet(spark, path, bounds=(0.0, 0.0, 50.0, 50.0))
        return pruned.count()
    finally:
        shutil.rmtree(td, ignore_errors=True)


def b7_total_bounds(spark):
    from spatialpandas_spark import total_bounds_aggs, with_bounds

    pts = with_bounds(make_points(spark), "geom", "point")
    return pts.agg(*total_bounds_aggs("bounds")).first()[0]


def b8_minhash(spark):
    from spatialpandas_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return minhash_lsh_pairs(docs, threshold=0.5).count()


def b9_ann_topk(spark):
    from spatialpandas_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return brute_force_topk(qs, emb, k=10).count()


def b11_grid_sjoin(spark):
    """Large x large spatial join (600k points x 150k diamonds) through the
    grid-cell shuffle plan — the strategy that scales when neither side
    broadcasts."""
    from spatialpandas_spark import sjoin, st_point

    li = _spread(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"))
    pts = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        st_point(
            (F.col("l_partkey") * 7919 % 5000).cast("double"),
            (F.col("l_suppkey") * 104729 % 5000).cast("double"),
        ).alias("geom"),
    )
    o = _spread(spark.read.parquet(f"{SF_DIR}/orders.parquet"))
    cx = (F.col("o_orderkey") * 6007 % 5000).cast("double")
    cy = (F.col("o_custkey") * 9973 % 5000).cast("double")
    r = (F.col("o_orderkey") % 3 + 1).cast("double")
    poly = F.array(F.array(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy))
    dias = o.select(F.col("o_orderkey").alias("did"), poly.alias("poly"))
    j = sjoin(
        pts, dias,
        left_geom="geom", right_geom="poly",
        left_type="point", right_type="polygon",
        strategy="grid", cell_size=50.0,
    )
    return j.count()


def b10_tpch_q1(spark):
    import __spark_entry__ as entrymod

    return entrymod.q_tpch_q1(spark, SF_DIR, exact=False).count()


def b13_cx_lines(spark):
    """Exact segment-vs-rect cx over ~1.5M 2-point lines through the
    vectorized Arrow kernel (bbox conjunct JVM-side, refinement one numpy
    pass per batch)."""
    from spatialpandas_spark import with_bounds
    from spatialpandas_spark.functions.arrow_kernels import cx_filter_arrow

    o = _spread(spark.read.parquet(f"{SF_DIR}/orders.parquet"))
    line = F.array(
        (F.col("o_orderkey") % 101).cast("double"),
        (F.col("o_orderkey") % 97).cast("double"),
        (F.col("o_custkey") % 89).cast("double"),
        (F.col("o_custkey") % 83).cast("double"),
    )
    df = with_bounds(
        o.select(F.col("o_orderkey").alias("id"), line.alias("geom")),
        "geom",
        "line",
    )
    return cx_filter_arrow(df, "geom", "line", (20.0, 20.0, 40.0, 35.0)).count()


def b12_text_pipeline(spark):
    """Scan-speed text analysis over documents: token stats (whitespace +
    BPE regex), language-ID, quality score, fingerprint — one pass, all
    JVM expressions."""
    from spatialpandas_spark.operators.text import (
        avg_word_length,
        bpe_token_count,
        char_count,
        doc_fingerprint,
        lang_id,
        quality_score,
        token_count,
    )

    d = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    out = d.select(
        "doc_id",
        token_count(F.col("text")).alias("ws_tokens"),
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
        char_count(F.col("text")).alias("n_chars"),
        avg_word_length(F.col("text")).alias("awl"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
        doc_fingerprint(F.col("text")).alias("fp"),
    )
    return out.agg(
        F.sum("bpe_tokens"), F.count_distinct("lang"), F.sum(F.crc32(F.col("fp").cast("string")))
    ).first()[0]


def b14_asof_join(spark):
    """As-of join of ~20k clicks to ~20k views (per-user backward match)
    through the union-window plan."""
    from spatialpandas_spark.operators.asof import asof_join
    from spatialpandas_spark.sources.events import read_events

    ev = _spread(read_events(spark, SF_DIR))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    return asof_join(clicks, views, on="ts", by="user_id").count()


def b15_dedup_clusters(spark):
    """Full near-dup pipeline at sf scale: MinHash-LSH pairs -> connected
    components -> cluster labels for every document."""
    from spatialpandas_spark.operators.dedup import near_dup_clusters

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return near_dup_clusters(docs, threshold=0.5).count()


def b16_knn(spark):
    """Exact kNN join (~19k query points x 600k corpus points, k=5)
    through the level-doubling grid plan, with the round-0 cell size
    picked automatically from a sampled k-th-NN distance estimate."""
    from spatialpandas_spark import st_point
    from spatialpandas_spark.operators.knn import sjoin_knn

    corpus = make_points(spark)
    o = _spread(spark.read.parquet(f"{SF_DIR}/orders.parquet"))
    qs = o.filter(F.col("o_orderkey") % 8 == 0).select(
        F.col("o_orderkey").alias("qid"),
        st_point(
            (F.col("o_orderkey") * 6007 % 500).cast("double"),
            (F.col("o_custkey") * 9973 % 500).cast("double"),
        ).alias("geom"),
    )
    j = sjoin_knn(qs, corpus, k=5, left_id="qid", right_id="id")
    return j.count()


def b17_interval(spark):
    """1-D interval join (600k lineitem ship-dates x ~15k order
    validity windows, ~60M matched pairs) through the bucketed
    range-join plan."""
    from spatialpandas_spark.operators.interval import interval_join

    li = _spread(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"))
    pts = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pid"),
        F.datediff(F.col("l_shipdate"), F.lit("1992-01-01")).cast("double").alias("v"),
    )
    o = _spread(spark.read.parquet(f"{SF_DIR}/orders.parquet"))
    start = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("double")
    ivs = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("iid"),
        start.alias("s"),
        (start + (F.col("o_orderkey") % 30 + 1).cast("double")).alias("e"),
    )
    j = interval_join(pts, ivs, value_col="v", start_col="s", end_col="e",
                      bucket_width=16.0)
    return j.count()


_MH_INDEX_PATH: str | None = None


def b18_index_probe(spark):
    """Amortized dedup: probe a 25% batch of documents against the
    persistent MinHash index built from the other 75% (built once, on
    the warm-up call — the amortization IS the operator's point; compare
    with b8_minhash, which recomputes all-pairs every run)."""
    global _MH_INDEX_PATH
    from spatialpandas_spark.operators.dedup_index import (
        build_minhash_index,
        dedup_against_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if _MH_INDEX_PATH is None:
        _MH_INDEX_PATH = os.path.join(
            tempfile.mkdtemp(prefix="bench_mh_"), "index"
        )
        build_minhash_index(docs.filter(F.col("doc_id") % 4 != 0), _MH_INDEX_PATH)
    return dedup_against_index(
        spark, _MH_INDEX_PATH, docs.filter(F.col("doc_id") % 4 == 0)
    ).count()


_QC_MODEL: dict | None = None


def b19_quality_scoring(spark):
    """Classifier scoring at scan speed: hashed unigram+bigram features
    + linear margin + sigmoid over all documents, one Arrow pass (model
    trained once on the warm-up call — amortized, like b18's index)."""
    global _QC_MODEL
    from spatialpandas_spark.operators.classifier import (
        score_documents,
        train_quality_classifier,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if _QC_MODEL is None:
        labeled = docs.withColumn(
            "label", (F.length("text") > 200).cast("int")
        )
        _QC_MODEL = train_quality_classifier(
            labeled.filter(F.col("doc_id") % 2 == 0), n_features=1 << 16
        )
    scored = score_documents(_spread(docs), _QC_MODEL)
    return scored.agg(F.sum("quality_prob")).first()[0]


_PQ_STATE: tuple | None = None


def b20_pq_scan(spark):
    """PQ ADC scan: the embeddings table tiled 64x (~128k vectors at
    sf0.1) is encoded to 8-byte codes once (warm-up amortized, like
    b18/b19 — at scale the codes are the persisted index), then every
    run ADC-scans the codes for 8 queries and exact-reranks the top
    candidates. Compare with b9: same query shape against raw floats."""
    global _PQ_STATE
    from spatialpandas_spark.operators.pq import pq_encode, pq_topk, train_pq

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    tiled = (
        emb.crossJoin(spark.range(64).withColumnRenamed("id", "rep"))
        .select(
            (F.col("vec_id") * 64 + F.col("rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + (F.col("rep") % 7).cast("float") * F.lit(0.01),
            ).alias("embedding"),
        )
    )
    if _PQ_STATE is None:
        # corpus + codes are the persisted state of a real deployment —
        # cache both once; the per-run work is the ADC scan + rerank join
        tiled = tiled.repartition(spark.sparkContext.defaultParallelism)
        tiled.cache().count()
        books = train_pq(tiled, m_sub=8, n_codes=64, sample_n=2048, iters=4)
        codes = pq_encode(tiled, books).repartition(
            spark.sparkContext.defaultParallelism
        )
        codes.cache().count()
        _PQ_STATE = (books, codes, tiled)
    books, codes, tiled = _PQ_STATE
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return pq_topk(qs, codes, books, k=10, rerank=tiled, rerank_factor=4).count()


_IVFPQ_PATH: str | None = None


def b21_ivfpq_probe(spark):
    """Persistent IVF-PQ probe: the 64x-tiled corpus (~128k vectors at
    sf0.1) is indexed once on the warm-up call (bucket-partitioned
    8-byte codes + stored vectors); every run probes 8 queries through
    the static-pruned ADC scan with exact stored rerank — the serving
    path whose bytes-touched is ~n_probe/n_centroids x m_sub/256 of a
    raw scan."""
    global _IVFPQ_PATH
    from spatialpandas_spark.operators.similarity_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if _IVFPQ_PATH is None:
        tiled = (
            emb.crossJoin(spark.range(64).withColumnRenamed("id", "rep"))
            .select(
                (F.col("vec_id") * 64 + F.col("rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x + (F.col("rep") % 7).cast("float") * F.lit(0.01),
                ).alias("embedding"),
            )
        )
        _IVFPQ_PATH = os.path.join(tempfile.mkdtemp(prefix="bench_ivfpq_"), "index")
        build_ivfpq_index(
            tiled, _IVFPQ_PATH, n_centroids=16, m_sub=8, n_codes=64,
            store_vectors=True,
        )
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return query_ivfpq_index(
        spark, _IVFPQ_PATH, qs, k=10, n_probe=4, rerank="stored"
    ).count()


_BPE_MERGES = None


def b22_bpe_encode(spark):
    """BPE tokenization of the documents table: merges trained once
    (amortized, the persisted-model serving shape) then applied per run
    through the Arrow batch path with the distinct-word cache."""
    from spatialpandas_spark.operators.bpe import bpe_encode, train_bpe

    global _BPE_MERGES
    d = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    if _BPE_MERGES is None:
        _BPE_MERGES = train_bpe(d, n_merges=500, text_col="text")
    return (
        bpe_encode(d, _BPE_MERGES, id_col="doc_id", text_col="text")
        .agg(F.sum("n_tokens"))
        .first()[0]
    )


_MEDIA_DF = None


def b23_media_decode(spark):
    """Mixed-format media featurization: 3000 real payloads (PNG + BMP +
    float-WAV, synthesized once and cached) through the magic-sniffing
    Arrow decode path — the codec layer's serving shape."""
    import numpy as np

    from spatialpandas_spark.operators.bmp import encode_bmp
    from spatialpandas_spark.operators.multimodal import extract_features
    from spatialpandas_spark.operators.png import encode_png

    global _MEDIA_DF
    if _MEDIA_DF is None:
        import struct as _s

        rng = np.random.default_rng(5)
        rows = []
        for i in range(3000):
            kind = i % 3
            if kind < 2:
                img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
                payload = encode_png(img) if kind == 0 else encode_bmp(img)
            else:
                vals = rng.standard_normal((256, 1)).astype("<f4") * 0.1
                raw = vals.tobytes()
                fmt = _s.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
                body = (
                    b"WAVEfmt " + _s.pack("<I", len(fmt)) + fmt
                    + b"data" + _s.pack("<I", len(raw)) + raw
                )
                payload = b"RIFF" + _s.pack("<I", len(body)) + body
            rows.append((i, payload))
        _MEDIA_DF = spark.createDataFrame(
            rows, "media_id long, payload binary"
        ).repartition(32).cache()
        _MEDIA_DF.count()
    return (
        extract_features(_MEDIA_DF, decoder="media")
        .filter("decode_ok = 'ok'")
        .count()
    )


_WARC_DF = None


def b24_crawl_extract(spark):
    """Crawl ingestion chain: WARC archives (synthesized once from every
    document via the shared Catalyst generator ``synth_warc_archives``
    — the SAME payload shape the scrub_normalize gate verifies — then
    cached) exploded by the real parser and HTML-extracted to text per
    run. Measures sources/archives.py + operators/html.py end to end."""
    from spatialpandas_spark.operators.html import extract_text_from_html
    from spatialpandas_spark.sources.archives import (
        synth_warc_archives,
        warc_records,
    )

    global _WARC_DF
    if _WARC_DF is None:
        d = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
        _WARC_DF = (
            synth_warc_archives(d, n_archives=64).repartition(32).cache()
        )
        _WARC_DF.count()
    recs = warc_records(_WARC_DF)
    docs = recs.select(
        F.regexp_extract(F.col("url"), r"http://t/(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("body").alias("html"),
    )
    return (
        extract_text_from_html(docs, html_col="html")
        .filter("parse_ok = 'ok'")
        .agg(F.sum(F.length("text")))
        .first()[0]
    )


def b25_semantic_dedup(spark):
    """SemDeDup clustering over the embeddings table: centroid sample +
    2 Lloyd refinement scans + within-cluster exact-cosine pairs +
    connected components + per-row cluster labels."""
    from spatialpandas_spark.operators.semantic import semantic_dedup_clusters

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return semantic_dedup_clusters(
        emb, n_clusters=16, threshold=0.9, kmeans_iters=2
    ).count()


_UNIGRAM_TABLE = None


def b26_unigram_encode(spark):
    """Unigram-LM tokenization of the documents table: piece table
    trained once (EM driver-side over the capped word histogram —
    amortized, the persisted-model serving shape) then Viterbi-applied
    per run through the Arrow batch path with the distinct-word cache."""
    from spatialpandas_spark.operators.unigram import (
        train_unigram,
        unigram_encode_ids,
    )

    global _UNIGRAM_TABLE
    d = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    if _UNIGRAM_TABLE is None:
        _UNIGRAM_TABLE = train_unigram(d, vocab_size=200, text_col="text")
    return (
        unigram_encode_ids(d, _UNIGRAM_TABLE)
        .agg(F.sum("n_tokens"))
        .first()[0]
    )


def b27_sjoin_nearest(spark):
    """Nearest-neighbor join (~19k query points -> 1 nearest of 600k
    corpus points, max_distance cutoff, left join): the geopandas
    sjoin_nearest surface through the k=1 grid-kNN plan."""
    from spatialpandas_spark import st_point
    from spatialpandas_spark.operators.knn import sjoin_nearest

    corpus = make_points(spark)
    o = _spread(spark.read.parquet(f"{SF_DIR}/orders.parquet"))
    qs = o.filter(F.col("o_orderkey") % 8 == 0).select(
        F.col("o_orderkey").alias("qid"),
        st_point(
            (F.col("o_orderkey") * 6007 % 500).cast("double"),
            (F.col("o_custkey") * 9973 % 500).cast("double"),
        ).alias("geom"),
    )
    j = sjoin_nearest(
        qs, corpus, max_distance=2.0, how="left", left_id="qid",
        right_id="id",
    )
    return j.count()


def b28_dwithin(spark):
    """All-pairs distance join (~19k query points x 600k corpus,
    radius 2): one report-once hash equi-join at radius-width cells."""
    from spatialpandas_spark import st_point
    from spatialpandas_spark.operators.knn import sjoin_dwithin

    corpus = make_points(spark)
    o = _spread(spark.read.parquet(f"{SF_DIR}/orders.parquet"))
    qs = o.filter(F.col("o_orderkey") % 8 == 0).select(
        F.col("o_orderkey").alias("qid"),
        st_point(
            (F.col("o_orderkey") * 6007 % 500).cast("double"),
            (F.col("o_custkey") * 9973 % 500).cast("double"),
        ).alias("geom"),
    )
    return sjoin_dwithin(qs, corpus, 2.0, left_id="qid", right_id="id").count()


def b29_training_mix(spark):
    """The full multi-epoch training-layout recipe (round-7 gate
    training_mix): temperature-weighted source mixing (T=1/2 closed
    form), epoch replication + fractional hash epoch, deterministic
    shuffle order, BPE ids, materialize_token_sequences at seq_len 256.
    Exercises mix explode + one content-hash sort key + the two-phase
    running-sum layout + the single token-array shuffle end to end."""
    import __spark_entry__ as entrymod

    return entrymod.q_training_mix(spark, SF_DIR).count()


def b30_kmv_overlap(spark):
    """Corpus-overlap screen between the documents table's halves: two
    HLL-prefiltered shingle scans -> k-row KMV sketches -> one overlap
    row. The number that matters at scale: the whole comparison is two
    single scans; nothing joins across the corpora."""
    from spatialpandas_spark.operators.sketch import corpus_overlap

    docs = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    return corpus_overlap(a, b, k=1024).count()


_IVFSQ8_PATH: str | None = None


def b31_ivfsq8_probe(spark):
    """Persistent IVF-SQ8 probe over the same 64x-tiled corpus as b21:
    indexed once on the warm-up call (bucket-partitioned int8 codes +
    stored vectors), then 8 queries through the static-pruned
    dequantize-ADC scan with exact stored rerank — the middle point of
    the quantized-index matrix (dim bytes/row vs b21's m_sub and the
    float index's 8*dim)."""
    global _IVFSQ8_PATH
    from spatialpandas_spark.operators.similarity_index import (
        build_ivfsq8_index,
        query_ivfsq8_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if _IVFSQ8_PATH is None:
        tiled = (
            emb.crossJoin(spark.range(64).withColumnRenamed("id", "rep"))
            .select(
                (F.col("vec_id") * 64 + F.col("rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x + (F.col("rep") % 7).cast("float") * F.lit(0.01),
                ).alias("embedding"),
            )
        )
        _IVFSQ8_PATH = os.path.join(
            tempfile.mkdtemp(prefix="bench_ivfsq8_"), "index"
        )
        build_ivfsq8_index(
            tiled, _IVFSQ8_PATH, n_centroids=16, store_vectors=True
        )
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return query_ivfsq8_index(
        spark, _IVFSQ8_PATH, qs, k=10, n_probe=4, rerank="stored"
    ).count()


def b32_containment_probe(spark):
    """Direct benchmark-containment screen (the round-9 ADVICE fix):
    every 17th document as the eval set, its bottom-8192 shingle hashes
    probed against one scan of the rest — the screening pass whose cost
    bounds what decontaminate_screened pays per CLEAN benchmark."""
    from spatialpandas_spark.operators.sketch import containment_probe

    docs = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    return containment_probe(train, bench, n=5, k=8192).count()


_DECON_INDEX_PATH = None


def b33_decon_index_screen(spark):
    """Amortized benchmark screen against the PERSISTENT decontamination
    artifact (round 10, operators/contamination_index.py): the eval-set
    index (same every-17th-doc benchmark as b32) is built ONCE and
    cached on disk; each run screens the remaining documents against
    the store — the continuous-ingestion shape where the benchmark text
    never re-shingles. Pair with b32 (the one-shot probe) to read the
    amortization directly."""
    from spatialpandas_spark.operators.contamination_index import (
        build_decon_index,
        screen_against_index,
    )

    global _DECON_INDEX_PATH
    docs = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    if _DECON_INDEX_PATH is None:
        path = tempfile.mkdtemp(prefix="bench_decon_ix_") + "/ix"
        bench = docs.filter(F.col("doc_id") % 17 == 0).withColumn(
            "benchmark", (F.col("doc_id") % 3).cast("string")
        )
        build_decon_index(bench, path, group_cols=["benchmark"])
        _DECON_INDEX_PATH = path
    train = docs.filter(F.col("doc_id") % 17 != 0)
    return screen_against_index(train, _DECON_INDEX_PATH).count()


def b34_langid(spark):
    """Language-ID classifier serving (round 11, operators/langid.py):
    one Arrow pass of the shipped 23-language hashed char-n-gram +
    word model over the documents table — buckets in Catalyst, margins
    in numpy, no shuffle until the final tiny count-by-language."""
    from spatialpandas_spark.operators.langid import classify_language

    docs = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    return (
        classify_language(docs, "text", "lang_pred")
        .groupBy("lang_pred")
        .count()
        .count()
    )


def b35_span_dedup(spark):
    """Content-defined duplicate-span removal (round 11,
    operators/spans.py content_spans — the window-straddling fix):
    CDC token-hash boundaries, corpus-wide occurrence count on the
    span md5, reassemble survivors. Two uniform-key shuffles; the
    explode is linear and shuffle-free."""
    from spatialpandas_spark.operators.spans import remove_duplicate_spans

    docs = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    return (
        remove_duplicate_spans(
            docs, window=8, min_count=2, keep="none", align="content"
        )
        .agg(F.sum("kept_spans"))
        .collect()[0][0]
    )


BENCHES = {
    "b1_cx": b1_cx,
    "b2_area_sum": b2_area_sum,
    "b3_length": b3_length,
    "b4_bounds": b4_bounds,
    "b5_sjoin": b5_sjoin,
    "b6_pack_io": b6_pack_io,
    "b7_total_bounds": b7_total_bounds,
    "b8_minhash": b8_minhash,
    "b9_ann_topk": b9_ann_topk,
    "b10_tpch_q1": b10_tpch_q1,
    "b11_grid_sjoin": b11_grid_sjoin,
    "b12_text_pipeline": b12_text_pipeline,
    "b13_cx_lines": b13_cx_lines,
    "b14_asof_join": b14_asof_join,
    "b15_dedup_clusters": b15_dedup_clusters,
    "b16_knn": b16_knn,
    "b17_interval": b17_interval,
    "b18_index_probe": b18_index_probe,
    "b19_quality_scoring": b19_quality_scoring,
    "b20_pq_scan": b20_pq_scan,
    "b21_ivfpq_probe": b21_ivfpq_probe,
    "b22_bpe_encode": b22_bpe_encode,
    "b23_media_decode": b23_media_decode,
    "b24_crawl_extract": b24_crawl_extract,
    "b25_semantic_dedup": b25_semantic_dedup,
    "b26_unigram_encode": b26_unigram_encode,
    "b27_sjoin_nearest": b27_sjoin_nearest,
    "b28_dwithin": b28_dwithin,
    "b29_training_mix": b29_training_mix,
    "b30_kmv_overlap": b30_kmv_overlap,
    "b31_ivfsq8_probe": b31_ivfsq8_probe,
    "b32_containment_probe": b32_containment_probe,
    "b33_decon_index_screen": b33_decon_index_screen,
    "b34_langid": b34_langid,
    "b35_span_dedup": b35_span_dedup,
}


#: phase-anchor row count: big enough that JVM start noise vanishes,
#: small enough to cost ~1 s of the suite
_ANCHOR_N = 1 << 31


def _anchor_query(spark) -> None:
    spark.range(0, _ANCHOR_N, 1, 32).selectExpr(
        "sum(id * 2 + 1) AS s"
    ).collect()


def _time_anchor(spark) -> float:
    """Phase anchor (VERDICT r10 ask #5): a FIXED pure-JVM whole-stage-
    codegen aggregation — independent of SF_DIR and of every line of
    repo code — timed alongside every bench run. Machine-phase drift
    (thermal, co-tenancy, JVM warm-up regime) moves the anchor and the
    queries in lockstep, so per-query ratios NORMALIZED by the anchor
    separate real regressions from environment drift mechanically —
    r10's +23%-uniform-drift call needed manual isolated re-runs."""
    _anchor_query(spark)  # warm-up
    times = []
    for _ in range(3):
        t0 = time.time()
        _anchor_query(spark)
        times.append(time.time() - t0)
    return round(statistics.median(times), 3)


#: committed canonical isolated-per-query medians; see --write-baseline
BASELINE_ISOLATED = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BASELINE_isolated.json"
)

#: full per-run diagnostics (anchor series, isolated-baseline ratios,
#: untruncated errors) — everything too long for the driver-contract
#: stdout line lands here instead (round-14 verdict ask #1b)
DIAG_SIDECAR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "plans", "bench_diag_latest.json",
)


def _main_isolated() -> None:
    """``bench.py --isolated``: run EVERY query in its own subprocess
    (fresh JVM, cold code cache) — the measurement mode behind
    BASELINE.md's isolated-re-run noise discipline. ~20x slower wall
    clock than the in-suite mode (one JVM start per query), so the
    driver's per-round run stays in-suite; use this by hand when an
    in-suite number moves >20%. With ``--write-baseline`` the medians,
    min/max bands, date, and tree SHA are persisted to
    BASELINE_isolated.json — the committed canonical values that make
    drift adjudication mechanical (three consecutive rounds of ±20%
    environment lockstep drift needed manual forensics before this)."""
    import subprocess

    results: dict[str, float] = {}
    bands: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    anchor_sec = None
    aproc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--anchor"],
        capture_output=True, text=True, timeout=600,
    )
    try:
        anchor_sec = json.loads(
            (aproc.stdout.strip().splitlines() or [""])[-1]
        )["sec"]
    except Exception:
        errors["__anchor"] = (aproc.stderr or aproc.stdout)[-300:]
    for name in BENCHES:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True,
            text=True,
            timeout=600,
        )
        line = (proc.stdout.strip().splitlines() or [""])[-1]
        try:
            rec = json.loads(line)
            results[name] = rec["sec"]
            ts = rec.get("times", [rec["sec"]])
            bands[name] = [min(ts), max(ts)]
        except Exception:
            errors[name] = (proc.stderr or line)[-300:]
    out = {
        "metric": "bench_total_median_sec",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "sf": _sf(),
        "mode": "isolated",
        "anchor_sec": anchor_sec,
    }
    if errors:
        out["errors"] = errors
    if "--write-baseline" in sys.argv and not errors:
        import datetime
        import subprocess as sp

        sha = sp.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
        doc = {
            "date": datetime.date.today().isoformat(),
            "sha": sha,
            "sf": _sf(),
            "anchor_sec": anchor_sec,
            "queries": {
                q: {"median": results[q], "band": bands[q]}
                for q in results
            },
        }
        with open(BASELINE_ISOLATED, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")
        out["baseline_written"] = True
    print(json.dumps(out))


def _warm_machinery(spark) -> None:
    """One-time session machinery warm-up, run BEFORE any query is
    timed (round-12 b1_cx forensics): the pure-JVM anchor warms
    codegen but NOT the parquet datasource stack, the Python/Arrow
    worker pool, or the shuffle path — so whichever query ran first
    (b1_cx, the smallest) absorbed those one-time costs and flagged at
    1.30x anchor-normalized while its code was untouched. Warm each
    machinery family on a tiny input so the timed queries measure the
    QUERY, not session setup."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    # no type hints: `from __future__ import annotations` stringifies
    # them and breaks pandas_udf eval-type inference in this module
    def _mul(s):
        return s * 1.0

    _warm_udf = pandas_udf(_mul, DoubleType())

    df = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    df.limit(5).select(_warm_udf(df.n_nationkey.cast("double"))).collect()
    df.groupBy("n_regionkey").count().collect()


def _main_one(name: str) -> None:
    """Run a single query (fresh session); print median + raw times.

    Protocol (round 12): machinery warm-up, then 2 query warm-ups,
    then median of 5 timed runs. The old 1-warmup/median-of-3 sampled
    the knee of a long JIT decay curve (12-iteration forensics: 0.73 ->
    0.35 s monotonically over ~8 iterations on b1_cx), making the
    committed canonical a lottery over where compilation landed."""
    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name=f"bench_{name}")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_machinery(spark)
    fn = BENCHES[name]
    for _ in range(2):
        fn(spark)
    times = []
    for _ in range(5):
        t0 = time.time()
        fn(spark)
        times.append(time.time() - t0)
    print(json.dumps({
        "sec": round(statistics.median(times), 3),
        "times": [round(t, 3) for t in times],
    }))
    spark.stop()


def _per_query_drift(
    query_pos: dict[str, int],
    anchors: list[float],
    anchor_pos: list[int],
) -> dict[str, float]:
    """Per-query WARM-anchor drift factor (round-14 verdict ask #1).

    The in-suite run re-times the anchor every ~11 queries, but the old
    normalization divided EVERY query by anchors[0] — so when a
    co-tenancy storm arrived mid-suite (r14: anchor series 0.62→1.40),
    the tail's ratios were systematically under-corrected and the flag
    list was junk. This interpolates the WARM anchor series (anchors[1:]
    — anchors[0] is the only fresh-JVM-regime point and must not be
    mixed with warm ones, see the regime-matching note in main()) at
    each query's suite position, relative to the FIRST warm anchor.
    Stable suite → every factor ≈ 1.0 and behavior matches the old
    scheme; mid-suite storm → tail queries get the larger divisor the
    storm actually imposed on them."""
    warm = anchors[1:]
    wpos = anchor_pos[1:]
    if len(warm) < 2:
        return {q: 1.0 for q in query_pos}
    ref = warm[0]
    out = {}
    for q, qi in query_pos.items():
        if qi <= wpos[0]:
            val = warm[0]
        elif qi >= wpos[-1]:
            val = warm[-1]
        else:
            for j in range(1, len(wpos)):
                if qi < wpos[j]:
                    lo, hi = wpos[j - 1], wpos[j]
                    frac = (qi - lo) / (hi - lo)
                    val = warm[j - 1] + frac * (warm[j] - warm[j - 1])
                    break
        out[q] = round(val / ref, 3) if ref > 0 else 1.0
    return out


def _isolated_deltas(
    results: dict[str, float],
    anchor_sec: float | None = None,
    drift: dict[str, float] | None = None,
) -> dict | None:
    """In-suite medians vs the committed canonical isolated values:
    per-query ratio (in-suite / canonical median) so a >20% mover is
    classified against a RECORDED number, not a remembered one. When
    BOTH runs carry a phase-anchor time, the flag list is computed on
    ANCHOR-NORMALIZED ratios (ratio / (anchor_now / anchor_canonical)),
    additionally scaled by each query's bracketing-warm-anchor drift
    factor when available, so environment lockstep drift — including
    drift that ARRIVES mid-suite — self-cancels; raw ratios are kept
    alongside. The definitive drift-vs-regression call remains
    tools/bench_ab.py's interleaved A/B; this flags which queries
    need it."""
    try:
        with open(BASELINE_ISOLATED) as f:
            base = json.load(f)
    except Exception:  # noqa: BLE001 - baseline not yet written
        return None
    ratios = {
        q: round(results[q] / base["queries"][q]["median"], 2)
        for q in results
        if q in base["queries"] and base["queries"][q]["median"] > 0
    }
    out = {
        "baseline_sha": base.get("sha"),
        "baseline_date": base.get("date"),
        "ratio_vs_isolated": ratios,
    }
    base_anchor = base.get("anchor_sec")
    if anchor_sec and base_anchor:
        phase = anchor_sec / base_anchor
        norm = {
            q: round(r / (phase * (drift or {}).get(q, 1.0)), 2)
            for q, r in ratios.items()
        }
        out["anchor_phase_ratio"] = round(phase, 3)
        if drift:
            out["per_query_drift"] = drift
        out["ratio_vs_isolated_normalized"] = norm
        out["flagged_over_1p2x"] = sorted(
            q for q, r in norm.items() if r > 1.2
        )
    else:  # legacy baseline without an anchor: flag on raw ratios
        out["flagged_over_1p2x"] = sorted(
            q for q, r in ratios.items() if r > 1.2
        )
    return out


def _main_anchor() -> None:
    """``bench.py --anchor``: fresh JVM, time only the phase anchor."""
    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="bench_anchor")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"sec": _time_anchor(spark)}))
    spark.stop()


def main() -> None:
    if "--anchor" in sys.argv:
        return _main_anchor()
    if "--isolated" in sys.argv:
        return _main_isolated()
    if "--one" in sys.argv:
        return _main_one(sys.argv[sys.argv.index("--one") + 1])
    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    anchors = [_time_anchor(spark)]
    anchor_pos = [0]
    query_pos: dict[str, int] = {}
    _warm_machinery(spark)  # see docstring — don't bill setup to query #1

    # failure-isolated: one broken query must never zero out the whole
    # round's perf evidence (round-2 lesson — b14 crashed the entire run)
    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    # a start-only anchor misses load that ARRIVES mid-suite (round-12
    # session evidence: a concurrent pytest run produced 17 false flags
    # under a quiet-start anchor); re-time it periodically and at the
    # end so phase instability is visible in the record
    recheck_every = max(1, len(BENCHES) // 3)
    for qi, (name, fn) in enumerate(BENCHES.items()):
        if qi and qi % recheck_every == 0:
            anchors.append(_time_anchor(spark))
            anchor_pos.append(qi)
        query_pos[name] = qi
        try:
            for _ in range(2):  # 2 warm-ups: the JIT curve outlives 1
                fn(spark)
            times = []
            for _ in range(3):
                t0 = time.time()
                fn(spark)
                times.append(time.time() - t0)
            results[name] = round(statistics.median(times), 3)
        except Exception as exc:  # noqa: BLE001 — report, don't die
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    anchors.append(_time_anchor(spark))
    anchor_pos.append(len(BENCHES))

    # REGIME MATCHING (round-12 lesson, measured): the canonical
    # baseline's anchor is a FRESH-JVM measurement, and the first
    # in-suite anchor is the only one in that same cold regime — the
    # JVM's own warm-up halves the anchor by mid-suite (series
    # 0.398 -> 0.263.. observed), so normalizing with a warm median
    # inflated every ratio ~1.5x into false flags. Normalize with
    # anchors[0] for the cold-vs-canonical regime factor; mid-suite
    # drift is corrected per query from the WARM series (anchors[1:])
    # by _per_query_drift. Judge PHASE stability from the post-warm
    # series alone, where real co-tenancy shows up.
    anchor_sec = anchors[0]
    warm = anchors[1:] or anchors
    total = round(sum(results.values()), 3)
    # the DRIVER CONTRACT line: kept SHORT on purpose (round-14 verdict
    # ask #1b — the driver captures only the stdout tail, and the old
    # line with three embedded 35-entry diagnostic dicts was truncated
    # past parseability, zeroing the round-over-round record). Full
    # diagnostics go to the sidecar file below.
    out = {
        "metric": "bench_total_median_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": _sf(),
        "anchor_sec": anchor_sec,
        "phase_unstable": max(warm) / min(warm) > 1.25,
        "diag": DIAG_SIDECAR,
    }
    if errors:
        out["errors"] = {k: v[:120] for k, v in errors.items()}
    drift = _per_query_drift(query_pos, anchors, anchor_pos)
    deltas = _isolated_deltas(results, anchor_sec, drift=drift)
    diag = {
        "anchor_series": anchors,
        "anchor_positions": anchor_pos,
        "errors": errors,
    }
    if deltas is not None:
        out["flagged_over_1p2x"] = deltas["flagged_over_1p2x"]
        diag["isolated_baseline"] = deltas
    try:
        os.makedirs(os.path.dirname(DIAG_SIDECAR), exist_ok=True)
        with open(DIAG_SIDECAR, "w") as f:
            json.dump({**out, **diag}, f, indent=1, sort_keys=True)
            f.write("\n")
    except Exception as exc:  # noqa: BLE001 — diagnostics must not kill the contract line
        out["diag"] = f"unwritable: {type(exc).__name__}"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
