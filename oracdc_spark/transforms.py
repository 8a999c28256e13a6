"""Single-message-transform library (SURVEY §2.8) + pseudo-columns +
topic-name mappers — the pluggable surface of the reference, as plain
Column/DataFrame transforms and callable registries.

Reference files: kafka/transforms/OraNumberConverter.java:71-130,
OraIntervalConverter.java, HeaderToFieldConverter.java:54-203,
KeyToValueConverter.java:51-130, ToLowerCaseNameConverter.java:58-180;
runtime/data/KafkaPseudoColumnsProcessor.java:88-241; topic mappers
runtime/config/Kafka*TopicNameMapper.java (+ Parameters.java:213-221).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from oracdc_spark.functions.decoders import (
    ora_interval_ds_str,
    ora_interval_ym_str,
    ora_number_to_decimal_udf,
    ora_number_to_double,
    ora_number_to_long,
)

# ---------------------------------------------------------------------------
# OraNumberConverter / OraIntervalConverter SMTs
# ---------------------------------------------------------------------------

_NUMBER_TARGETS: dict[str, Callable[..., Column]] = {
    "double": lambda c, **_: ora_number_to_double(c),
    "float": lambda c, **_: ora_number_to_double(c).cast("float"),
    "long": lambda c, **_: ora_number_to_long(c),
    "int": lambda c, **_: ora_number_to_long(c).cast("int"),
    "short": lambda c, **_: ora_number_to_long(c).cast("short"),
    "byte": lambda c, **_: ora_number_to_long(c).cast("byte"),
    "string": lambda c, **_: ora_number_to_double(c).cast("string"),
    "decimal": lambda c, scale=10, **_: ora_number_to_decimal_udf(38, scale)(c),
}


def ora_number_convert(col: Column | str, target: str = "decimal", scale: int = 10) -> Column:
    """NUMBER bytes/hex → the requested field type (per-field list in the
    reference config; here applied per column)."""
    c = F.col(col) if isinstance(col, str) else col
    try:
        return _NUMBER_TARGETS[target](c, scale=scale)
    except KeyError:
        raise ValueError(f"unknown NUMBER target {target!r}") from None


def ora_interval_convert(col: Column | str, kind: str = "ds") -> Column:
    """INTERVAL bytes → canonical string ('ym' or 'ds')."""
    c = F.col(col) if isinstance(col, str) else col
    if kind == "ym":
        return ora_interval_ym_str(c)
    if kind == "ds":
        return ora_interval_ds_str(c)
    raise ValueError(f"unknown interval kind {kind!r}")


# ---------------------------------------------------------------------------
# structural SMTs
# ---------------------------------------------------------------------------


def header_to_field(
    df: DataFrame,
    header_col: str,
    field_name: str,
    value_map: dict[str, str] | None = None,
) -> DataFrame:
    """HeaderToFieldConverter: copy a record header into a value field,
    optionally translating values through the configured map — e.g.
    ``map=c:I,u:U,d:D`` turns op header ``c`` into ``_oracdcp = 'I'``
    (HeaderToFieldConverterTest fixture).  Unmapped values pass through.
    In the Spark Kafka model headers are an array<struct<key,value>>;
    scalar header columns copy directly."""
    src = F.col(header_col)
    if value_map:
        expr = src
        for k, v in value_map.items():
            expr = F.when(src == F.lit(k), F.lit(v)).otherwise(expr)
        src = expr
    return df.withColumn(field_name, src)


def key_to_value(df: DataFrame, key_cols: list[str], prefix: str = "") -> DataFrame:
    """KeyToValueConverter: merge key fields into the value schema."""
    out = df
    for k in key_cols:
        out = out.withColumn(f"{prefix}{k}", F.col(k))
    return out


def to_lowercase_names(df: DataFrame) -> DataFrame:
    """ToLowerCaseNameConverter: lowercase every field name."""
    return df.toDF(*[c.lower() for c in df.columns])


def sanitize_avro_names(df: DataFrame) -> DataFrame:
    """P12 — Avro-illegal chars → '_', leading digit prefixed
    (KafkaUtils.fixAvroFieldName semantics)."""
    import re

    def fix(name: str) -> str:
        fixed = re.sub(r"[^A-Za-z0-9_]", "_", name)
        if fixed and fixed[0].isdigit():
            fixed = "_" + fixed
        return fixed

    return df.toDF(*[fix(c) for c in df.columns])


# ---------------------------------------------------------------------------
# P11 — default-value substitution at record binding
# ---------------------------------------------------------------------------


def apply_default_values(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """Missing (NULL) values fall back to the dictionary DEFAULT for
    their column — the Spark restatement of the reference's Kafka
    Connect schema defaults (KafkaConnectSchema.java:181-279
    ``builder.defaultValue``; values typed by ``registry.typed_default``).
    Column match is case-insensitive (dictionary names are upper-case,
    feed columns lower-case).  Pure ``coalesce`` projection — stays in
    WholeStageCodegen, no shuffle."""
    by_lower = {k.lower(): v for k, v in defaults.items()}
    return df.select(
        *[
            F.coalesce(F.col(c), F.lit(by_lower[c.lower()])).alias(c)
            if c.lower() in by_lower
            else F.col(c)
            for c in df.columns
        ]
    )


# ---------------------------------------------------------------------------
# pseudo-columns (KafkaPseudoColumnsProcessor.java:88-241)
# ---------------------------------------------------------------------------


# a2.pseudocolumn.* kinds (Parameters.java:253-333).  Statement/transaction
# coordinates come from the structured feed; the LogMiner audit attributes
# (username/osusername/hostname/audit session/session info/client id) have
# no source in the structured feed and bind as typed NULLs — schema parity
# with the reference's OPTIONAL_*_SCHEMA fields, absent data.
# Emission order mirrors KafkaPseudoColumnsProcessor.addToSchema, which
# builds fields as rowScn, rowTs, commitScn, rowOp, rowXid — configured-name
# output schemas carry the reference's Avro field order.
PSEUDO_COLUMN_KINDS = (
    "ora_rowscn", "ora_rowts", "ora_commitscn", "ora_operation", "ora_xid",
    "ora_username", "ora_osusername", "ora_hostname",
    "ora_audit_session_id", "ora_session_info", "ora_client_id",
)

_AVRO_FIELD_NAME = None  # compiled lazily


def valid_avro_field_name(name: str) -> bool:
    """KafkaUtils.validAvroFieldName: [A-Za-z_][A-Za-z0-9_]*."""
    global _AVRO_FIELD_NAME
    if _AVRO_FIELD_NAME is None:
        import re

        _AVRO_FIELD_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    return bool(_AVRO_FIELD_NAME.match(name))


def pseudo_columns_from_config(
    stamped: DataFrame, spec: dict[str, str], wrapped: bool = False
) -> DataFrame:
    """Config-named pseudo-columns (KafkaPseudoColumnsProcessor.java:
    88-240): each entry of ``spec`` ({kind: field_name}, the parsed
    ``a2.pseudocolumn.*`` properties) appends a field with the
    CONFIGURED name.  ``wrapped=True`` mirrors the reference's
    non-supplemental-log-all mode, where every pseudo field is a
    {V: value} struct.  opName() values per
    OraCdcStatementBase.java:129-136."""
    op_name = (
        F.when(F.col("op") == 1, F.lit("INSERT"))
        .when(F.col("op") == 3, F.lit("UPDATE"))
        .when(F.col("op") == 2, F.lit("DELETE"))
        .otherwise(F.lit("XML DOC BEGIN"))
    )
    sources = {
        "ora_rowscn": F.col("scn").cast("long"),
        "ora_commitscn": F.col("commit_scn").cast("long"),
        "ora_rowts": (
            F.col("ts") if "ts" in stamped.columns else F.lit(None).cast("timestamp")
        ),
        "ora_operation": op_name,
        "ora_xid": F.col("xid"),
        "ora_username": F.lit(None).cast("string"),
        "ora_osusername": F.lit(None).cast("string"),
        "ora_hostname": F.lit(None).cast("string"),
        "ora_audit_session_id": F.lit(None).cast("long"),
        "ora_session_info": F.lit(None).cast("string"),
        "ora_client_id": F.lit(None).cast("string"),
    }
    out = stamped
    for kind in PSEUDO_COLUMN_KINDS:  # deterministic field order
        if kind not in spec:
            continue
        col = sources[kind]
        if wrapped:
            col = F.struct(col.alias("V"))
        out = out.withColumn(spec[kind], col)
    return out


def add_pseudo_columns(
    stamped: DataFrame,
    row_scn: bool = True,
    commit_scn: bool = True,
    xid: bool = True,
    operation: bool = True,
) -> DataFrame:
    """Append the requested ORA_* pseudo-columns to a commit-stamped
    change DataFrame (plain withColumns — SURVEY §1.2)."""
    out = stamped
    if row_scn:
        out = out.withColumn("ORA_ROW_SCN", F.col("scn"))
    if commit_scn:
        out = out.withColumn("ORA_COMMIT_SCN", F.col("commit_scn"))
    if xid:
        out = out.withColumn("ORA_XID", F.col("xid"))
    if operation:
        out = out.withColumn(
            "ORA_OP",
            F.when(F.col("op") == 1, "c").when(F.col("op") == 3, "u").otherwise("d"),
        )
    return out


# ---------------------------------------------------------------------------
# LOB transformation plugin hook (OraCdcLobTransformationsIntf.java:50,
# default impl OraCdcDefaultLobTransformationsImpl.java:42; wired at
# KafkaStructDataBinder.java:148-155) — a user-supplied Column -> Column
# rewrite per LOB column (e.g. extract text, hash, redact, externalize).
# ---------------------------------------------------------------------------


def apply_lob_transforms(
    df: DataFrame, transforms_by_col: dict[str, Callable[[Column], Column]]
) -> DataFrame:
    """Apply registered per-column LOB transformations before envelope
    binding; unregistered columns pass through (the default impl)."""
    out = df
    for col, fn in transforms_by_col.items():
        if col in out.columns:
            out = out.withColumn(col, fn(F.col(col)))
    return out


# ---------------------------------------------------------------------------
# topic / schema name mappers (callable registry)
# ---------------------------------------------------------------------------


def default_topic_mapper(prefix: str = "") -> Callable[[str | None, str, str], str]:
    """KafkaDefaultSchemaNameMapper: [prefix][pdb_]owner_table."""

    def f(pdb: str | None, owner: str, table: str) -> str:
        parts = [p for p in (pdb, owner, table) if p]
        return (prefix + "_" if prefix else "") + "_".join(parts)

    return f


def single_topic_mapper(topic: str) -> Callable[[str | None, str, str], str]:
    """KafkaSingleTopicNameMapper: everything to one topic."""
    return lambda pdb, owner, table: topic


def flexible_topic_mapper(template: str) -> Callable[[str | None, str, str], str]:
    """KafkaFlexibleTopicNameMapper: template with %PDB%/%OWNER%/%TABLE%."""

    def f(pdb: str | None, owner: str, table: str) -> str:
        return (
            template.replace("%PDB%", pdb or "")
            .replace("%OWNER%", owner)
            .replace("%TABLE%", table)
        )

    return f
