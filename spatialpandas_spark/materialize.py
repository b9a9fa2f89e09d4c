"""Shared-branch materialization with a scale-appropriate strategy knob.

Several operators compute an intermediate once and read it from MULTIPLE
DataFrame branches of the same query (self-joins over signatures, probe
chains, span metadata). Spark's AQE stage cache does not recognize
re-resolved subtrees (fresh expression ids) as equal, so without an
explicit materialization every branch re-runs the full subtree — measured
in round 14 as a 2-4x recompute of Arrow signature passes.

Two mechanisms exist, with opposite trade-offs (optimization guide §5;
round-14 VERDICT "What's wrong" #4):

- ``localCheckpoint(eager=False)``: truncates lineage into one shared RDD
  node; blocks live on executor block managers only. Cheapest locally and
  its RDD is cleaned up by the ContextCleaner when the query is garbage
  collected — no cache-manager leak across repeated calls. Hazard at
  cluster scale: an executor loss mid-query makes the blocks
  unrecoverable (no lineage to recompute from), failing the job; lazy
  checkpoints are additionally fragile under speculative re-execution.
- ``persist(StorageLevel.MEMORY_AND_DISK)``: the logical-plan cache routes
  every branch through one InMemoryRelation while KEEPING lineage, so an
  executor loss recomputes only the lost partitions. The right default on
  a real cluster. Cost: cached plans are held by the session's
  CacheManager until ``unpersist()`` — for query-internal intermediates
  (which the caller cannot unpersist) a long-lived session accumulates
  entries, so local bench/test loops keep the checkpoint default.

``SPARK_GRAFT_MATERIALIZE`` selects the strategy (``checkpoint`` locally —
the default, matching the bench contract — ``persist`` for cluster
deployments). Both pin the subtree to ONE materialization serving all
branches; plan-shape tests assert that property, not the mechanism.

Why the default must stay ``checkpoint`` for benchmarking: the
CacheManager matches cached relations by LOGICAL PLAN equality, so with
``persist`` a second invocation that rebuilds the same query in the same
session silently reads the first invocation's cached data instead of
recomputing. In production that cross-query reuse is a feature; in a
timed benchmark it is result caching across runs (the r15 env-A/B read
0.47x on b8 under persist for exactly this reason — runs 2..n skipped
the signature compute entirely — so that number is disqualified, not a
win). ``localCheckpoint`` creates a fresh RDD per call and can never
alias a previous invocation's results.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def materialize_branches(df: DataFrame) -> DataFrame:
    """Materialize ``df`` so every DataFrame branch that reads the result
    shares one computation of its subtree (strategy per module docstring)."""
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "checkpoint")
    if mode == "persist":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=False)
