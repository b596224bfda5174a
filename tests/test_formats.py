"""Schema-enforced CSV/JSONL readers: typed good rows, verbatim reject
capture, no whole-load poisoning from single bad rows."""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sensor_data_pipeline___spark.sources import formats

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def test_jsonl_corrupt_capture(spark, tmp_path):
    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "value": 1.5}\n'
        "this is not json\n"
        '{"id": 2, "name": "b", "value": 2.5}\n'
        '{"id": "NaNo", "name": "c", "value": 3.5}\n'
    )
    good, bad = formats.split_rejects(formats.read_jsonl(spark, str(p), SCHEMA))
    grows = {r.id: (r.name, r.value) for r in good.collect()}
    assert grows == {1: ("a", 1.5), 2: ("b", 2.5)}
    raws = [r.raw_line for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws) and any("NaNo" in r for r in raws)


def test_csv_corrupt_capture(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text("id,name,value\n1,a,1.5\n2,b,not_a_number\n3,c,3.5\n")
    good, bad = formats.split_rejects(formats.read_csv(spark, str(p), SCHEMA))
    assert {r.id for r in good.collect()} == {1, 3}
    raws = [r.raw_line for r in bad.collect()]
    assert raws == ["2,b,not_a_number"]


def test_csv_good_rows_fully_typed(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text("id,name,value\n1,a,1.5\n")
    good, _ = formats.split_rejects(formats.read_csv(spark, str(p), SCHEMA))
    assert [f.dataType.simpleString() for f in good.schema.fields] == [
        "bigint",
        "string",
        "double",
    ]


def test_orc_roundtrip_pushdown_and_partition_pruning(spark, tmp_path):
    """ORC write/read preserves types exactly; filters reach the ORC
    scan (PushedFilters) and partition pruning prunes directories."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.sources import readers
    from sensor_data_pipeline___spark.sources.formats import read_orc, write_orc

    orders = readers.table(spark, "orders", "/root/testdata/sf0.001")
    path = str(tmp_path / "orders_orc")
    write_orc(orders.withColumn("prio", F.col("o_orderpriority")), path, ["prio"])

    back = read_orc(spark, path)
    assert back.count() == orders.count()
    # type fidelity on the non-partition columns
    want = {f.name: f.dataType for f in orders.schema.fields}
    got = {f.name: f.dataType for f in back.schema.fields}
    for name, dt in want.items():
        assert got[name] == dt, name

    q = back.filter((F.col("prio") == "1-URGENT") & (F.col("o_totalprice") > 1000.0))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan
    assert "PartitionFilters: [" in plan and "prio" in plan
    expected = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 1000.0)
    ).count()
    assert q.count() == expected


def test_jsonl_gzip_transparent(spark, tmp_path):
    """Crawler handoffs arrive gzip-compressed; the JSONL reader (and
    its corrupt-record capture) must work identically on .jsonl.gz —
    Spark's text-based sources decompress by extension. Note the scale
    trade: gzip files are NOT splittable, so one file = one scan task;
    the writer contract is many ~100 MB .gz files, never one giant."""
    import gzip

    p = tmp_path / "feed.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write(
            '{"id": 1, "name": "a", "value": 1.5}\n'
            "garbage line\n"
            '{"id": 2, "name": "b", "value": 2.5}\n'
        )
    good, bad = formats.split_rejects(formats.read_jsonl(spark, str(p), SCHEMA))
    assert {r.id: r.value for r in good.collect()} == {1: 1.5, 2: 2.5}
    assert [r.raw_line for r in bad.collect()] == ["garbage line"]
