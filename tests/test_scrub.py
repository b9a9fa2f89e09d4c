"""scrub_pii / normalize_text vs a Python re oracle."""

import re

from pyspark.sql import functions as F

from spatialpandas_spark.operators.text import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    URL_RE,
    normalize_text,
    scrub_pii,
)


def _py_scrub(t):
    t = re.sub(URL_RE, "<URL>", t)
    t = re.sub(EMAIL_RE, "<EMAIL>", t)
    t = re.sub(IPV4_RE, "<IP>", t)
    t = re.sub(PHONE_RE, "<PHONE>", t)
    return t


CASES = [
    "mail me at john.doe+spam@sub.example.co.uk please",
    "docs at https://a.b/c?d=1&e=%20f and http://x.io",
    "server 192.168.001.1 and 10.0.0.7 are down",
    "call +1 555-123-4567 or 08 1234 5678 now",
    "url with at-sign https://u:p@host.com/x stays one token",
    "no pii here at all",
    "  Mixed   CASE\t\twith\nnewlines  ",
]


def test_scrub_matches_python_re(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i long, t string")
    got = {r["i"]: r["s"] for r in df.select("i", scrub_pii(F.col("t")).alias("s")).collect()}
    for i, c in enumerate(CASES):
        assert got[i] == _py_scrub(c), c


def test_scrub_replaces_every_category(spark):
    df = spark.createDataFrame([(0, " ".join(CASES))], "i long, t string")
    s = df.select(scrub_pii(F.col("t")).alias("s")).first()["s"]
    for tok in ("<URL>", "<EMAIL>", "<IP>", "<PHONE>"):
        assert tok in s
    assert "example.co.uk" not in s and "192.168" not in s


def test_normalize_collapses_and_lowercases(spark):
    df = spark.createDataFrame([(0, "  Mixed   CASE\t\twith\nnewlines  ")], "i long, t string")
    s = df.select(normalize_text(F.col("t")).alias("s")).first()["s"]
    assert s == "mixed case with newlines"
