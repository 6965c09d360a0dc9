"""IP ring: parse/format inverses, CIDR semantics, ip_range buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import ip as ipops


def test_parse_format_inverse_python():
    for s in ["0.0.0.0", "10.4.0.1", "255.255.255.255", "192.168.1.17"]:
        assert ipops.format_ip(ipops.parse_ip(s)) == s
    for bad in ["10.4.0", "10.4.0.256", "a.b.c.d", "1.2.3.4.5"]:
        with pytest.raises(ValueError):
            ipops.parse_ip(bad)


def test_column_roundtrip(spark):
    vals = [0, 1, 167772160, 168034304, 4294967295, 3232235777]
    df = spark.createDataFrame([(v,) for v in vals], ["ip_long"])
    rows = (
        df.withColumn("s", ipops.long_to_ip_col("ip_long"))
        .withColumn("back", ipops.ip_to_long_col("s"))
        .collect()
    )
    for r in rows:
        assert r.back == r.ip_long
        assert r.s == ipops.format_ip(r.ip_long)


def test_parse_cidr_alignment_and_pred(spark):
    # unaligned address is masked down to the network base
    lo, hi = ipops.parse_cidr("10.5.7.9/14")
    assert lo == ipops.parse_ip("10.4.0.0")
    assert hi - lo == 1 << 18
    assert ipops.parse_cidr("1.2.3.4") == (ipops.parse_ip("1.2.3.4"),
                                           ipops.parse_ip("1.2.3.4") + 1)
    with pytest.raises(ValueError):
        ipops.parse_cidr("10.0.0.0/33")
    df = spark.createDataFrame(
        [(ipops.parse_ip(s),) for s in
         ["10.3.255.255", "10.4.0.0", "10.7.255.255", "10.8.0.0"]],
        ["ip_long"],
    )
    got = [r.ip_long for r in
           df.filter(ipops.cidr_pred("ip_long", "10.4.0.0/14")).collect()]
    assert sorted(got) == [ipops.parse_ip("10.4.0.0"),
                           ipops.parse_ip("10.7.255.255")]


def test_ip_range_agg_preserves_empty_buckets(spark):
    df = spark.createDataFrame(
        [(ipops.parse_ip("10.1.0.0"),), (ipops.parse_ip("10.9.0.0"),)],
        ["ip_long"],
    )
    out = {
        r.key: r.doc_count
        for r in ipops.ip_range_agg(
            df, "ip_long",
            [("a", None, "10.4.0.0"), ("empty", "10.4.0.0", "10.8.0.0"),
             ("b", "10.8.0.0", None)],
        ).collect()
    }
    assert out == {"a": 1, "empty": 0, "b": 1}


def test_cidr_pred_is_scan_pushable(spark, sf_dir):
    from bigdatasearchpro_spark.sources.files import load_table

    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        (F.lit(167772160)
         + (F.col("c_custkey") * F.lit(2654435761)) % F.lit(1048576)
         ).alias("ip_long")
    )
    out = base.filter(ipops.cidr_pred("ip_long", "10.4.0.0/14"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # pure integer range filter, single codegen span, no exchange
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
