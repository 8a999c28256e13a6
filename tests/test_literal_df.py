"""plans.literal.local_df contract: literal tables plan as
LocalRelations (no Python-RDD scan) and hold exactly the rows the
tuple path would.

The r12 optimization routed the PQ/OPQ literal tables (codebooks,
rotation matrices, allocation maps) through the Arrow/pandas
``createDataFrame`` path: a list-of-tuples ``createDataFrame`` becomes
a ``Scan ExistingRDD`` over ``applySchemaToPythonRDD``, whose every
broadcast build launches a Python-worker stage (~0.7-1.1 s each at
bench scale); the pandas path yields a **LocalRelation**, a pure plan
literal whose broadcast is a driver-local build.  Results must be
identical — only the physical scan differs.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE  # noqa: F401  (shared session fixture wiring)

from oracdc_spark.plans.literal import local_df


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_local_df_is_local_relation(spark):
    df = local_df(spark, [(1, 2), (3, 4)], "a long, b long")
    assert "LocalRelation" in _analyzed(df)
    assert "ExistingRDD" not in _analyzed(df)


def test_local_df_rows_match_tuple_path(spark):
    rows = [(0, [1, None, 3]), (1, [None, None, None]), (2, [])]
    schema = "k long, vs array<long>"
    via_local = local_df(spark, rows, schema).collect()
    via_tuples = spark.createDataFrame(rows, schema).collect()
    assert sorted(map(tuple, via_local)) == sorted(map(tuple, via_tuples))


def test_local_df_empty_keeps_schema(spark):
    df = local_df(spark, [], "sub long, cqs array<long>")
    assert df.count() == 0
    assert [f.simpleString() for f in df.schema.fields] == [
        "sub:bigint",
        "cqs:array<bigint>",
    ]


def test_pq_literal_tables_are_local_relations(spark):
    """The converted call sites actually produce LocalRelations: the
    codebook/centroid-norm tables out of _literal_assign_tables and the
    WHT matrix inside _rotate_components."""
    from oracdc_spark.operators.pq import PQ_K, _literal_assign_tables

    cb_rows = [(s, c, i, s * 100 + c) for s in range(2) for c in range(2) for i in range(4)]
    cb_arr, cc2_arr = _literal_assign_tables(spark, cb_rows, PQ_K)
    assert "LocalRelation" in _analyzed(cb_arr)
    assert "LocalRelation" in _analyzed(cc2_arr)
    # values survive the pandas hop exactly (None padding included)
    got = {(r["sub"], r["i"]): r["cqs"] for r in cb_arr.collect()}
    assert got[(0, 0)][0] == 0 and got[(0, 0)][1] == 1
    assert got[(0, 0)][2:] == [None] * (PQ_K - 2)
