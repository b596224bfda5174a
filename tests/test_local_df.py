"""operators/_local.py: the JVM-native local-frame builder that
replaces list-backed createDataFrame in the engine's driver-side
small-frame sites (index metadata, cached centroids, manifests,
empty-table reads). Pins value/type fidelity and the plan property
that motivates it (no Python-RDD scan in the plan)."""

from pyspark.sql import types as T

from sensor_data_pipeline___spark.operators._local import local_df


def test_values_types_and_nulls_roundtrip(spark):
    df = local_df(
        spark,
        [(1, "a", [0.5, None], None), (None, None, None, True)],
        "i bigint, s string, v array<double>, b boolean",
    )
    assert df.schema.simpleString() == (
        "struct<i:bigint,s:string,v:array<double>,b:boolean>"
    )
    rows = [tuple(r) for r in df.collect()]
    assert rows == [(1, "a", [0.5, None], None), (None, None, None, True)]


def test_empty_and_all_null_columns_stay_typed(spark):
    df = local_df(spark, [], "a int, d date")
    assert df.count() == 0
    assert [f.dataType for f in df.schema.fields] == [
        T.IntegerType(), T.DateType()
    ]
    df2 = local_df(spark, [(None,), (None,)], "x double")
    assert [r.x for r in df2.collect()] == [None, None]
    assert df2.schema.fields[0].dataType == T.DoubleType()


def test_struct_type_schema_and_row_input(spark):
    schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
        ]
    )
    src = local_df(spark, [(0, [1.0, 2.0]), (1, [3.0, 4.0])], schema)
    # Row objects (e.g. from .collect()) are positional like tuples
    again = local_df(spark, src.collect(), schema)
    assert sorted(map(tuple, again.collect())) == [
        (0, [1.0, 2.0]), (1, [3.0, 4.0])
    ]


def test_plan_is_jvm_side_no_python_rdd_scan(spark):
    """The reason this module exists: a list-backed createDataFrame
    plans `Scan ExistingRDD` (a Python-worker round trip per action);
    local_df must plan pure JVM expressions."""
    df = local_df(spark, [(8, "xxhash64")], "n int, key string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan
