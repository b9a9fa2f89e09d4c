"""Geometry constructors (F11 from_exterior_coords parity)."""
def test_polygon_from_exterior_coords(spark):
    """F11: exterior vertex pairs -> one-ring polygon; open rings close;
    area/length agree with the closed-form square."""
    from pyspark.sql import functions as F

    from spatialpandas_spark import st_area, st_length
    from spatialpandas_spark.functions.constructors import (
        st_polygon_from_exterior,
    )

    pairs = F.array(
        F.array(F.lit(0.0), F.lit(0.0)),
        F.array(F.lit(4.0), F.lit(0.0)),
        F.array(F.lit(4.0), F.lit(4.0)),
        F.array(F.lit(0.0), F.lit(4.0)),
    )  # open square, CCW
    df = spark.range(1).select(st_polygon_from_exterior(pairs).alias("geom"))
    row = df.select(
        F.col("geom"),
        st_area(F.col("geom"), "polygon").alias("a"),
        st_length(F.col("geom"), "polygon").alias("l"),
    ).first()
    assert row["geom"][0][-2:] == [0.0, 0.0]  # closed
    assert row["a"] == 16.0
    assert row["l"] == 16.0
    # already-closed input is untouched
    closed = F.concat(pairs, F.array(F.array(F.lit(0.0), F.lit(0.0))))
    row2 = spark.range(1).select(
        st_polygon_from_exterior(closed).alias("g")
    ).first()
    assert row2["g"] == row["geom"]


def test_multipolygon_from_exterior_coords(spark):
    from pyspark.sql import functions as F

    from spatialpandas_spark import st_area
    from spatialpandas_spark.functions.constructors import (
        st_multipolygon_from_exterior,
    )

    def sq(x0, s):
        return F.array(
            F.array(F.lit(x0), F.lit(0.0)),
            F.array(F.lit(x0 + s), F.lit(0.0)),
            F.array(F.lit(x0 + s), F.lit(s)),
            F.array(F.lit(x0), F.lit(s)),
        )

    mp = F.array(sq(0.0, 2.0), sq(10.0, 3.0))
    df = spark.range(1).select(st_multipolygon_from_exterior(mp).alias("g"))
    row = df.select(st_area(F.col("g"), "multipolygon").alias("a")).first()
    assert row["a"] == 4.0 + 9.0
