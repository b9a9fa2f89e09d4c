"""Retired driver gates keep full oracle-checked coverage in CI.

Five gates left the 50-slot driver registry in round 7 (slots went to the
promoted training_sequences / unigram_encode / media_probe rows and the
new training_mix composition): total_bounds, geom_groupby,
corpus_pipeline, tpch_q3, tpch_q5. Round 10 retired bounds_multipoint
the same way (slot went to the promoted streaming_sketch twin —
VERDICT r9 ask #3). This module runs each retired Spark query against
its unchanged DuckDB oracle at sf0.001 with the same
rows/columns/values compare the driver uses — the coverage moved here,
it did not disappear.
"""

import duckdb
import pytest

import __spark_entry__ as entry
from tools.check_contract import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(entry.retired_queries()))
def test_retired_gate_matches_oracle(spark, con, name):
    sdf = entry.retired_queries()[name](spark, SF_DIR).toPandas()
    odf = con.sql(entry.retired_oracle_sql()[name]).df()
    assert compare(sdf, odf, name) == []
