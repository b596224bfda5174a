"""Read-boundary timestamp normalization (VERDICT r2 item 4).

The driver regenerates /root/testdata and has shipped the events.ts
column in BOTH parquet flavors across rounds: tz-aware timestamp[us,
tz=UTC] (Spark TIMESTAMP) and tz-naive timestamp[us] (Spark
TIMESTAMP_NTZ). Round 2's bench died because three queries did
``ts.cast("double")`` on the NTZ flavor. These tests pin the contract:
``readers.table`` canonicalizes to LTZ, and the three epoch-based
queries produce IDENTICAL results on either flavor.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sensor_data_pipeline___spark import queries
from sensor_data_pipeline___spark.sources import readers

EPOCH_QUERIES = ["time_weighted_avg", "psi_value_drift", "interarrival_histogram"]


def _write_events(path: str, tz: str | None) -> None:
    """A tiny events table with sub-second timestamps in one tz flavor."""
    base = 1_700_000_000_000_000  # µs
    ts = pa.array(
        [base, base + 1_500_000, base + 4_250_000, base + 9_000_000] * 2,
        type=pa.timestamp("us", tz=tz),
    )
    table = pa.table(
        {
            "event_id": pa.array(list(range(8)), type=pa.int64()),
            "user_id": pa.array([1, 1, 2, 2, 3, 3, 4, 4], type=pa.int64()),
            "event_type": pa.array(["a", "a", "a", "a", "b", "b", "b", "b"]),
            "ts": ts,
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0]),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def flavor_dirs(tmp_path_factory):
    dirs = {}
    for flavor, tz in [("ntz", None), ("ltz", "UTC")]:
        d = tmp_path_factory.mktemp(f"sf_{flavor}")
        _write_events(os.path.join(str(d), "events.parquet"), tz)
        dirs[flavor] = str(d)
    return dirs


def test_reader_canonicalizes_ntz_to_ltz(spark, flavor_dirs):
    for flavor in ("ntz", "ltz"):
        df = readers.table(spark, "events", flavor_dirs[flavor])
        assert df.schema["ts"].dataType.typeName() == "timestamp", flavor
        # And the epoch arithmetic that killed BENCH_r02 is legal again.
        df.selectExpr("cast(ts as double)").collect()


def test_reader_preserves_instants_across_flavors(spark, flavor_dirs):
    rows = {
        flavor: sorted(
            r.ts
            for r in readers.table(spark, "events", flavor_dirs[flavor])
            .select("ts")
            .collect()
        )
        for flavor in ("ntz", "ltz")
    }
    assert rows["ntz"] == rows["ltz"]
    # Pinned-UTC session: the naive value IS the UTC instant.
    assert rows["ntz"][0] == dt.datetime(2023, 11, 14, 22, 13, 20)


@pytest.mark.parametrize("name", EPOCH_QUERIES)
def test_epoch_queries_flavor_invariant(spark, flavor_dirs, name):
    results = {}
    for flavor in ("ntz", "ltz"):
        df = queries.QUERIES[name](spark, flavor_dirs[flavor])
        results[flavor] = sorted(map(tuple, df.collect()))
    assert results["ntz"] == results["ltz"]
    assert len(results["ntz"]) > 0
