"""SemDeDup-style semantic deduplication over an embedding column
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023 — the published recipe large pretraining
pipelines use to prune paraphrase-level duplicates that MinHash cannot
see).

Recipe: spherical k-means partitions the embedding space; candidate
pairs are generated ONLY within a cluster (the published approximation
— cross-cluster near-dups are missed by design, the accepted recall
trade for making the pair volume sum(|cluster|^2) instead of n^2);
pairs above the cosine threshold are closed transitively (similarity is
not transitive) and each cluster keeps its smallest id, the same
deterministic survivor rule as ``dedup_exact`` / ``dedup_near``.

Everything composes existing scale shapes: deterministic md5-sample
centroids + spherical Lloyd refinement (``similarity._centroids`` /
``kmeans_refine`` — one scan per iteration), one Arrow
``bucket_assign_arrow`` pass, a bucket-keyed self-join (AQE splits hot
clusters; ``n_clusters`` must grow with corpus size to bound
|cluster|), one Arrow cosine pass over candidates, and the
alternating-star connected components of ``operators/graph.py``. With
``kmeans_iters=0`` the whole pipeline is deterministic closed-form SQL
(the IVF gate already replays centroid assignment), which is what the
driver-gate variant uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "auto_n_clusters",
    "semantic_dedup_pairs",
    "semantic_dedup_clusters",
    "semantic_dedup",
]

#: auto-scaling target: mean |cluster| the default aims for. Within-
#: cluster pair volume is then ~ n * TARGET/2 — LINEAR in corpus size
#: with a constant multiplier — instead of the n^2/k degeneration a
#: fixed cluster count hits as the corpus grows.
_TARGET_MEAN_CLUSTER = 1024
_MAX_AUTO_CLUSTERS = 1 << 20


def auto_n_clusters(
    vectors: DataFrame,
    id_col: str = "vec_id",
    target_mean_cluster: int = _TARGET_MEAN_CLUSTER,
    n: int | None = None,
) -> int:
    """Cluster count that keeps the MEAN cluster size ~constant as the
    corpus grows (the ``estimate_knn_cell_size`` auto-tune discipline
    applied to SemDeDup): one column-pruned count (pass ``n`` to skip
    it when the caller already knows), then ``ceil(n / target)``
    clamped to [1, 2^20]. At 100 TB this is what keeps the
    within-cluster self-join linear; a fixed ``n_clusters`` must
    instead be revisited every time the corpus grows 10x."""
    if target_mean_cluster <= 0:
        raise ValueError("target_mean_cluster must be positive")
    if n is None:
        n = vectors.select(id_col).count()
    return max(1, min(_MAX_AUTO_CLUSTERS, -(-n // target_mean_cluster)))


def semantic_dedup_pairs(
    vectors: DataFrame,
    n_clusters: int | None = None,
    threshold: float = 0.95,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cluster near-duplicate pairs: ``(id_a, id_b, sim)`` with
    ``id_a < id_b`` and ``sim >= threshold`` (exact cosine, computed
    only for same-cluster pairs). Null vectors are dropped at the
    boundary (the ANN-surface contract).

    ``n_clusters=None`` (default) auto-scales via
    :func:`auto_n_clusters` so the mean cluster size — and with it the
    per-row candidate-pair volume — stays ~constant as the corpus
    grows; pass an explicit count to pin it (the driver gate does, for
    a deterministic oracle)."""
    from spatialpandas_spark.operators.similarity import (
        _centroids,
        bucket_assign_arrow,
        kmeans_refine,
        within_bucket_pairs_arrow,
    )

    if n_clusters is None:
        n_clusters = auto_n_clusters(vectors, id_col)
    cents = _centroids(vectors, id_col, vec_col, n_clusters)
    if kmeans_iters > 0:
        cents = kmeans_refine(vectors, cents, kmeans_iters, id_col, vec_col)
    v = vectors.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).filter(F.col("__cv").isNotNull())
    # ONE grouped Arrow pass: assign buckets in the scan stage, shuffle
    # each vector ONCE on the cluster key, and emit within-cluster pairs
    # from a blocked gram prefilter + exact sequential re-evaluation
    # (bit-identical sims — see within_bucket_pairs_arrow). This replaces
    # the round-13 bucket-keyed SELF-join, which shipped every vector
    # twice, materialized |cluster|^2 two-vector candidate rows into the
    # cosine kernel, and whose tiny-bytes exchange AQE coalesced to a
    # single task (round-14 profile: one 16 s task carried the whole
    # pair volume at sf0.1). The broadcast-shaped plan the round-13
    # merge hint banned cannot reappear: there is no join left.
    assigned = bucket_assign_arrow(v, cents, vec_col="__cv")
    return within_bucket_pairs_arrow(assigned, threshold)


def semantic_dedup_clusters(
    vectors: DataFrame,
    n_clusters: int | None = None,
    threshold: float = 0.95,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Every row labeled with its semantic-duplicate ``cluster_id`` (the
    smallest id in its transitive near-dup group; singletons keep their
    own id) and the group size — the ``near_dup_clusters`` shape on the
    embedding surface."""
    from spatialpandas_spark.operators.dedup import _attach_cluster_sizes
    from spatialpandas_spark.operators.graph import connected_components

    pairs = semantic_dedup_pairs(
        vectors, n_clusters, threshold, kmeans_iters, id_col, vec_col
    )
    comp = connected_components(pairs, "id_a", "id_b")
    # sizes from the component table alone (corpus scanned once, never
    # shuffled) — see _attach_cluster_sizes
    return _attach_cluster_sizes(vectors, comp, id_col)


def semantic_dedup(
    vectors: DataFrame,
    n_clusters: int | None = None,
    threshold: float = 0.95,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Keep one row per semantic-duplicate group (smallest id — the
    deterministic survivor rule shared across the dedup family).
    Columns pass through untouched.

    Survivor selection needs only the component table (absent from the
    pair graph, or its own representative) — the cluster-size
    aggregation+join of the clusters variant is skipped (round-14)."""
    from spatialpandas_spark.operators.graph import connected_components

    pairs = semantic_dedup_pairs(
        vectors, n_clusters, threshold, kmeans_iters, id_col, vec_col
    )
    comp = connected_components(pairs, "id_a", "id_b")
    return (
        vectors.join(comp, vectors[id_col] == comp["node"], "left")
        .filter(
            F.col("component").isNull()
            | (F.col("component") == F.col(id_col).cast("long"))
        )
        .select(*vectors.columns)
    )
