"""SQL-string surface: registered functions callable from spark.sql."""

import struct


def test_registered_functions_work_in_sql(spark):
    from spatialpandas_spark.functions.register import register_sql_functions

    names = register_sql_functions(spark)
    assert "st_hilbert" in names and "st_aswkb_polygon" in names

    spark.range(64).createOrReplaceTempView("grid_pts")
    rows = spark.sql(
        """
        SELECT st_hilbert(CAST(id % 8 AS DOUBLE), CAST(id DIV 8 AS DOUBLE),
                          0.0D, 0.0D, 8.0D, 8.0D, 3) AS h
        FROM grid_pts
        """
    ).collect()
    assert sorted(r["h"] for r in rows) == list(range(64))

    wkb = spark.sql("SELECT st_aswkb_point(1.0D, 2.0D) AS w").first()["w"]
    assert bytes(wkb) == bytes.fromhex("0101000000") + struct.pack("<2d", 1.0, 2.0)

    wkb2 = spark.sql(
        "SELECT st_aswkb_line(array(0.0D, 0.0D, 1.0D, 1.0D)) AS w"
    ).first()["w"]
    assert bytes(wkb2)[:5] == bytes.fromhex("0102000000")
