"""Deterministic sampling for corpus curation.

``df.sample()`` is seed-dependent *per partition layout* — the same seed
yields different rows after a repartition, which makes pipeline runs
non-reproducible. Curation needs content-keyed sampling: a row's fate
depends only on its key, so reruns, backfills, and incremental updates
agree. The standard trick is hash-mod thresholding, a pure scan-stage
filter: no shuffle, no state, trivially parallel at 100 TB, and
engine-independent (the md5-prefix hash is reproducible in any SQL
engine — same base hash the MinHash/SimHash oracles use).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-space denominator: rates are quantized to 1/1e6
_DENOM = 1_000_000


def sample_hash(key: Column, seed: int = 42) -> Column:
    """Non-negative 60-bit deterministic hash of (seed, key): the integer
    value of the first 15 hex chars of ``md5(seed || ':' || key)`` —
    ``('0x' || substr(md5(...), 1, 15))::BIGINT`` in DuckDB."""
    s = F.concat(F.lit(f"{seed}:"), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 42
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by key hash (reproducible across
    runs, partitionings, and engines). ``rate`` is quantized to 1/1e6."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    thr = int(round(rate * _DENOM))
    return df.filter(sample_hash(F.col(key_col), seed) % _DENOM < thr)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    key_col: str,
    seed: int = 42,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group (the domain-cap curation
    op: no single source may dominate the corpus). Rows are chosen in
    deterministic hash order of (seed, key) — partition-invariant and
    rerun-stable, same contract as ``hash_sample`` — never by input
    order. ``rank_col`` optionally exposes the 1-based within-group
    rank.

    Scale: one shuffle on the group column; skewed groups (hot domains)
    are exactly the rows the cap discards, and AQE splits the hot
    partitions while the per-partition window streams in sorted order —
    no group's rows ever need to fit in memory at once."""
    if max_rows <= 0:
        raise ValueError("max_rows must be positive")
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        sample_hash(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    rc = rank_col or "__rn"
    out = df.withColumn(rc, F.row_number().over(w)).filter(
        F.col(rc) <= max_rows
    )
    return out if rank_col else out.drop(rc)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum hash sampling — e.g. language-balanced corpus curation:
    keep all of a low-resource language, downsample the dominant one.

    ``rates`` maps stratum value -> keep rate; strata not listed use
    ``default_rate``. One scan, no shuffle: the per-row threshold is a
    CASE expression on the stratum column."""
    for v, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {v!r} must be in [0, 1]")
    thr: Column = F.lit(int(round(default_rate * _DENOM)))
    for v, r in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(v), F.lit(int(round(r * _DENOM)))
        ).otherwise(thr)
    return df.filter(sample_hash(F.col(key_col), seed) % _DENOM < thr)


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: every row gets exactly
    one label from DISJOINT, EXHAUSTIVE hash ranges over
    ``sample_hash(key) % 1e6`` — the split a 100 TB pipeline can rerun
    on any cluster, any partitioning, any engine and get the same
    answer (the same md5-prefix arithmetic every sampling op here
    uses). ``splits`` maps label -> fraction in ITERATION order (ranges
    are assigned cumulatively, so reordering relabels rows —
    dict-insertion order is the contract); fractions are quantized to
    1/1e6 and must sum to exactly 1 after quantization — a silent gap
    would leak rows out of every split, a silent overlap would double-
    count, so anything else raises.

    One scan, no shuffle: the label is a CASE expression on the key
    hash. Adding data later never reassigns existing keys (the label is
    a pure function of the key), which is what makes the held-out set
    stable under corpus growth.

    A NULL key has no hash, so it cannot be assigned deterministically;
    rather than silently leaking such rows out of every split (ADVICE
    r9), the CASE's otherwise-branch raises at execution time —
    matching ``sequence_batch``'s id-length guard. Filter or fill null
    keys before splitting."""
    if not splits:
        raise ValueError("splits must be non-empty")
    quant = {}
    for name, frac in splits.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1]")
        quant[name] = int(round(frac * _DENOM))
    total = sum(quant.values())
    if total != _DENOM:
        raise ValueError(
            f"split fractions must sum to 1 (quantized at 1/{_DENOM}): "
            f"got {total / _DENOM} from {splits}"
        )
    h = sample_hash(F.col(key_col), seed) % _DENOM
    expr = None
    cum = 0
    for name, q in quant.items():
        cum += q
        cond = h < F.lit(cum)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    # cum == _DENOM and h < _DENOM, so for a non-null key the last
    # branch always catches; only a NULL key (null hash -> every
    # condition null) reaches otherwise, and that must not pass silently
    return df.withColumn(
        split_col,
        expr.otherwise(
            F.raise_error(
                F.lit(
                    f"assign_splits: NULL {key_col!r} cannot be "
                    "assigned a split deterministically; filter or "
                    "fill null keys first"
                )
            )
        ),
    )


def systematic_sample(
    df: DataFrame,
    weight_col: str,
    order_cols: list,
    step: int,
    offset: int | None = None,
    seed: int = 42,
    mult_col: str = "n_hits",
    npartitions: int | None = None,
) -> DataFrame:
    """Deterministic weight-proportional (PPS) SYSTEMATIC sampling
    without replacement: rows are laid on the integer weight line in
    ``order_cols`` order (exclusive running sum ``s``, width ``w``) and
    a row is selected iff its interval ``[s, s+w)`` contains a lattice
    point ``offset + k*step`` — so P(select) = w/step for w < step
    (exactly proportional to weight), heavy rows (w >= step) are always
    selected, and ``mult_col`` carries the lattice-point count (the
    standard PPS multiplicity, ~w/step for heavy rows: a downstream
    estimator weighting by step*n_hits is unbiased). This is classic
    systematic/PPS sampling — the deterministic-integer alternative to
    exponential-variate weighted reservoirs, chosen here because every
    comparison is EXACT integer arithmetic: rerun-, partition-, and
    engine-invariant (the hash-sampling family's contract), trivially
    SQL-replayable.

    ``offset`` defaults to a deterministic hash of ``seed`` in
    ``[0, step)``. Weights must be non-negative integers (token/char
    counts); zero-weight rows are never selected.

    Scale: the two-phase running sum (operators/rank.py — range shuffle
    + partition-local window + broadcast prefix offsets, no single-task
    window) plus a scan-stage integer filter. Nothing else moves."""
    import hashlib

    from spatialpandas_spark.operators.rank import with_running_sum

    st = int(step)
    if st <= 0:
        raise ValueError("step must be positive")
    if offset is None:
        offset = (
            int(hashlib.md5(f"{seed}:pps".encode()).hexdigest()[:15], 16)
            % st
        )
    off = int(offset) % st

    rs = with_running_sum(
        df, order_cols, weight_col, "__rsum", npartitions
    ).withColumn(
        "__excl", (F.col("__rsum") - F.col(weight_col)).cast("long")
    )
    # lattice points in [0, x): 0 when x <= off, else (x-off-1) div step + 1
    hits = F.expr(
        f"(CASE WHEN __rsum <= {off} THEN CAST(0 AS BIGINT)"
        f" ELSE (CAST(__rsum AS BIGINT) - {off} - 1) DIV {st} + 1 END) -"
        f"(CASE WHEN __excl <= {off} THEN CAST(0 AS BIGINT)"
        f" ELSE (__excl - {off} - 1) DIV {st} + 1 END)"
    )
    return (
        rs.withColumn(mult_col, hits)
        .filter(F.col(mult_col) > 0)
        .drop("__rsum", "__excl")
    )
