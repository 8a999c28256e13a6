"""LOB transformation plugin + key overrides."""

import pyspark.sql.functions as F

from oracdc_spark.registry import (
    KEY_ROWID_PSEUDO,
    KEY_WELL_DEFINED_PK,
    OVERRIDE_COLUMNS,
    OVERRIDE_ROWID,
    choose_key,
)
from oracdc_spark.transforms import apply_lob_transforms


def test_key_override_rowid():
    assert choose_key(("ID",), (), override=OVERRIDE_ROWID) == (
        ("ORA_ROW_ID",),
        KEY_ROWID_PSEUDO,
    )


def test_key_override_columns():
    assert choose_key(("ID",), (), override=OVERRIDE_COLUMNS, override_cols=("A", "B")) == (
        ("A", "B"),
        KEY_WELL_DEFINED_PK,
    )


def test_lob_transform_registry(spark):
    df = spark.createDataFrame(
        [(1, "long clob text here", "keepme")], "pk long, doc string, other string"
    )
    out = apply_lob_transforms(
        df,
        {
            "doc": lambda c: F.md5(c),          # externalize-as-digest plugin
            "missing_col": lambda c: F.lit(0),   # unregistered column ignored
        },
    ).collect()[0]
    import hashlib

    assert out.doc == hashlib.md5(b"long clob text here").hexdigest()
    assert out.other == "keepme"
