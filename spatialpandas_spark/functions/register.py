"""SQL-string surface: register the UDF-tier functions with the session so
``spark.sql(...)`` queries can call them (SURVEY.md §2.8 adopted plan).

Only functions that are genuinely UDFs get registered (Hilbert, WKB);
measures/predicates are higher-order-function *expressions* — in SQL
strings those are written directly (``aggregate(transform(...)))``), and
the DataFrame API remains the typed surface for them.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType

_WKB_TYPES = ("point", "multipoint", "line", "multiline", "polygon", "multipolygon")


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register st_hilbert and per-type WKB codecs; returns the names."""
    import numpy as np

    from spatialpandas_spark.functions.hilbert import hilbert_from_centers
    from spatialpandas_spark.functions.wkb import st_as_wkb, st_from_wkb

    names = []

    @F.pandas_udf(LongType())
    def _st_hilbert(
        cx: pd.Series,
        cy: pd.Series,
        x0: pd.Series,
        y0: pd.Series,
        x1: pd.Series,
        y1: pd.Series,
        p: pd.Series,
    ) -> pd.Series:
        if len(cx) == 0:
            return pd.Series([], dtype="int64")
        tb = (float(x0.iloc[0]), float(y0.iloc[0]), float(x1.iloc[0]), float(y1.iloc[0]))
        out = hilbert_from_centers(
            cx.to_numpy(np.float64), cy.to_numpy(np.float64), tb, int(p.iloc[0])
        )
        return pd.Series(out)

    spark.udf.register("st_hilbert", _st_hilbert)
    names.append("st_hilbert")

    # WKB codecs are built as Column functions; wrap each type pair into
    # a registerable single-argument pandas UDF over the same VECTORIZED
    # batch encoders st_as_wkb uses (byte-identical to the per-row twin)
    from spatialpandas_spark.functions import wkb as _wkb

    for t in _WKB_TYPES:
        if t == "point":
            # SQL surface takes (x, y) for points
            @F.pandas_udf(BinaryType())
            def _enc_pt(x: pd.Series, y: pd.Series) -> pd.Series:
                return _wkb._enc_batch_point_safe(x, y)

            spark.udf.register("st_aswkb_point", _enc_pt)
            names.append("st_aswkb_point")
            continue

        def _make(gt):
            @F.pandas_udf(BinaryType())
            def _enc_any(s: pd.Series) -> pd.Series:
                return _wkb._enc_batch_safe(s, gt)

            return _enc_any

        spark.udf.register(f"st_aswkb_{t}", _make(t))
        names.append(f"st_aswkb_{t}")

    return names
