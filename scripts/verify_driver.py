"""Driver-contract verification, the way the verification driver runs
it (VERDICT r5 directive #8: the full-surface sf0.01 sweep as ONE
command).

Builds a vanilla SparkSession with a HOSTILE config (non-UTC session
timezone, local[8]) — the engine must self-correct via
``apply_runtime_confs`` — imports ``/root/repo/__spark_entry__.py`` the
way the driver does (spec_from_file_location), smoke-checks
``entry()``, then runs EVERY ``queries()`` entry at sf0.01 against its
``oracle_sql()`` twin on DuckDB: sorted column names, row count, and
order-insensitive value hash (Arrow fetch, Decimal tagged — the
driver's exact strictness). Rows-only entries (no oracle) are executed
and checked for a stable non-empty schema.

Usage::

    python scripts/verify_driver.py [--sf-dir /root/testdata/sf0.01] \
        [--only name1,name2]

Exit code 0 iff everything matches; one status line per query on
stderr, one JSON summary line on stdout.
"""

from __future__ import annotations

import argparse
import decimal
import importlib.util
import json
import math
import sys
import time

REPO = "/root/repo"


def _canon(value):
    if value is None:
        return "<null>"
    if isinstance(value, decimal.Decimal):
        return f"decimal:{value}"
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        return repr(value)
    if isinstance(value, int):
        return str(value)
    return str(value)


def _row_set(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import duckdb
    from pyspark.sql import SparkSession

    # hostile session: wrong TZ, no repo confs — entry()/queries()
    # must self-correct through apply_runtime_confs
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-driver")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)

    t0 = time.time()
    flagship = entry_mod.entry(spark)
    n = flagship.count()
    cols = flagship.columns
    print(
        f"entry(): {n} rows, schema {cols} ({time.time() - t0:.1f}s)",
        file=sys.stderr,
    )
    assert n > 0 and cols == ["time", "name", "value"], (n, cols)

    from sensor_data_pipeline___spark.sources.readers import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = {s for s in args.only.split(",") if s}
    failures: dict[str, str] = {}
    n_oracle = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
            if name in oracles:
                tbl = con.execute(oracles[name]).arrow()
                duck_cols = list(tbl.schema.names)
                duck_rows = list(
                    zip(*(tbl.column(c).to_pylist() for c in duck_cols))
                ) if duck_cols else []
                if sorted(spark_cols) != sorted(duck_cols):
                    raise AssertionError(
                        f"columns {spark_cols} vs {duck_cols}"
                    )
                if len(spark_rows) != len(duck_rows):
                    raise AssertionError(
                        f"rows {len(spark_rows)} vs {len(duck_rows)}"
                    )
                if _row_set(spark_rows, spark_cols) != _row_set(
                    duck_rows, duck_cols
                ):
                    s = _row_set(spark_rows, spark_cols)
                    d = _row_set(duck_rows, duck_cols)
                    diff = next(
                        (a, b) for a, b in zip(s, d) if a != b
                    )
                    raise AssertionError(f"hash mismatch, first diff {diff}")
                n_oracle += 1
                status = f"MATCH ({len(spark_rows)} rows)"
            else:
                assert len(spark_cols) > 0
                n_rows_only += 1
                status = f"rows-only OK ({len(spark_rows)} rows)"
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            failures[name] = f"{type(exc).__name__}: {exc}"
            status = f"FAIL {failures[name][:200]}"
        print(f"{name}: {status} ({time.time() - t0:.1f}s)", file=sys.stderr)

    summary = {
        "sf_dir": args.sf_dir,
        "oracle_matched": n_oracle,
        "rows_only_ok": n_rows_only,
        "failed": sorted(failures),
        "failures": failures,
    }
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
