"""Deterministic training-data ordering: global shuffle, source mixing,
epoch-aware oversampling.

A training run needs its input in a reproducible pseudo-random order —
the same corpus + seed must yield the same sequence on any cluster
size, after any repartition, on rerun. ``df.orderBy(rand(seed))`` fails
that (rand is partition-layout-dependent); the content-keyed answer is
to sort by a hash of (seed, row key), the same md5-prefix family the
deterministic sampler uses (operators/sampling.py) — reproducible in
any engine, so the ordering itself is oracle-checkable.

``mix_sources`` composes the standard pretraining recipe: per-source
weights (0.3 of web, 2.5 epochs of books, ...), where fractional
weights hash-sample and weights > 1 replicate whole epochs (each epoch
re-keyed so copies spread through the global order), then one
deterministic shuffle over the union.

Scale notes (100 TB): the shuffle is ONE global range-partitioned sort
on a 60-bit key — Spark's bread-and-butter TB-scale operation; epoch
replication is a union of narrow projections (no data copy until the
sort's exchange); sampling is a scan-stage filter. Nothing touches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialpandas_spark.operators.sampling import _DENOM, sample_hash


def deterministic_shuffle(
    df: DataFrame, key_col: str, seed: int = 42
) -> DataFrame:
    """Rows in pseudo-random but fully reproducible order: sorted by
    md5-prefix hash of (seed, key), ties broken by the key itself. One
    range-partitioned sort; layout- and engine-independent."""
    return df.orderBy(
        sample_hash(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )


def with_shuffle_rank(
    df: DataFrame, key_col: str, seed: int = 42, rank_col: str = "shuffle_rank"
) -> DataFrame:
    """The shuffle order as an explicit 0-based global rank column —
    what a sharded writer consumes. Two-phase (partial sort + offset
    join) would avoid the single-direction window; Spark's
    ``row_number`` over a global order already executes as a
    range-partitioned sort + per-partition numbering with a tiny
    offset exchange, so the plain formulation is scale-correct."""
    from pyspark.sql.window import Window

    w = Window.orderBy(
        sample_hash(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return df.withColumn(rank_col, F.row_number().over(w) - 1)


def temperature_weights(
    sizes: dict[str, float],
    temperature: float = 1.0,
    budget: float | None = None,
) -> dict[str, float]:
    """Per-source epoch weights implementing temperature-based source
    sampling (the published multilingual/multi-corpus pretraining
    recipe: sampling proportion ``q_s ∝ p_s^(1/T)`` where ``p_s`` is a
    source's natural share) — feed the result straight into
    :func:`mix_sources`.

    ``sizes`` are per-source row (or token) counts; ``budget`` is the
    total expected output size (default: the natural total, so T=1
    returns weight 1.0 for every source — one natural epoch each).
    T > 1 flattens the distribution (upsamples small sources: their
    weight exceeds 1 = multiple epochs, the known repetition trade);
    T -> inf approaches uniform shares per source. Weights are exact
    closed-form: ``w_s = budget * q_s / n_s``."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    if not sizes:
        raise ValueError("sizes must be non-empty")
    if any(n <= 0 for n in sizes.values()):
        raise ValueError("every source size must be positive")
    total = float(sum(sizes.values()))
    if budget is None:
        budget = total
    shares = {s: (n / total) ** (1.0 / temperature) for s, n in sizes.items()}
    z = sum(shares.values())
    return {s: budget * shares[s] / z / sizes[s] for s in sizes}


def mix_sources(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    key_col: str,
    seed: int = 42,
    source_col: str = "source",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Weighted deterministic mixture of corpora, globally shuffled.

    ``weights[name]`` is the expected number of passes over source
    ``name``: 0.3 keeps a 30% hash-sample, 2.5 emits two full epochs
    plus a 50% sample as epoch 2. Every copy is re-keyed with its epoch
    (seed xor'd per epoch) so replicas interleave through the global
    order instead of clustering. Columns must align across sources
    (unionByName); output adds (source, epoch)."""
    if set(sources) != set(weights):
        raise ValueError("sources and weights must have the same keys")
    parts = []
    for name in sorted(sources):
        df, w = sources[name], weights[name]
        if w < 0:
            raise ValueError(f"weight for {name!r} must be >= 0")
        full, frac = int(w), round(w - int(w), 6)
        for ep in range(full):
            parts.append(
                df.withColumn(source_col, F.lit(name)).withColumn(
                    epoch_col, F.lit(ep)
                )
            )
        if frac > 0:
            thr = int(round(frac * _DENOM))
            parts.append(
                df.filter(
                    sample_hash(
                        F.concat(F.lit(f"{name}#{full}#"), F.col(key_col)),
                        seed,
                    )
                    % _DENOM
                    < thr
                )
                .withColumn(source_col, F.lit(name))
                .withColumn(epoch_col, F.lit(full))
            )
    if not parts:
        raise ValueError("no sources")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # per-epoch re-keying: the shuffle key hashes (source, epoch, key)
    shuffled = out.orderBy(
        sample_hash(
            F.concat_ws(
                "#", F.col(source_col), F.col(epoch_col), F.col(key_col)
            ),
            seed,
        ).asc(),
        F.col(source_col).asc(),
        F.col(epoch_col).asc(),
        F.col(key_col).asc(),
    )
    return shuffled
