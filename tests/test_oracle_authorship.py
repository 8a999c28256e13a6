"""Gate: the oracle-authorship registry is complete and its evidence
resolves (r9 verdict item 2 — the mechanical closure of the BPE class).

* every declared query is classified exactly once;
* every ``replay`` entry cites an existing test ("file::name" or
  "file::Class::method" — the first whitespace token) whose target
  this gate resolves by AST, so a renamed/deleted model property
  breaks the build instead of silently orphaning the oracle;
* the one ``none`` entry is exactly the documented rows-only query.

No Spark session needed: queries() only builds a dict of callables.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

import pytest

from tests.oracle_authorship import AUTHORSHIP, INDEPENDENT, NONE, REPLAY

REPO = Path(__file__).resolve().parent.parent


def _declared_queries():
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as e

    return set(e.queries()), set(e.oracle_sql())


def test_every_declared_query_is_classified():
    declared, oracles = _declared_queries()
    missing = declared - set(AUTHORSHIP)
    extra = set(AUTHORSHIP) - declared
    assert not missing, f"unclassified queries: {sorted(missing)}"
    assert not extra, f"registry entries for undeclared queries: {sorted(extra)}"
    # `none` is reserved for queries without a DuckDB oracle, and every
    # query without an oracle must be classified `none`
    none_entries = {q for q, (cls, _) in AUTHORSHIP.items() if cls == NONE}
    assert none_entries == declared - oracles


def _test_exists(path: Path, parts: list[str]) -> bool:
    tree = ast.parse(path.read_text())
    if len(parts) == 1:
        return any(
            isinstance(n, ast.FunctionDef) and n.name == parts[0]
            for n in tree.body
        )
    for n in tree.body:
        if isinstance(n, ast.ClassDef) and n.name == parts[0]:
            return any(
                isinstance(m, ast.FunctionDef) and m.name == parts[1]
                for m in n.body
            )
    return False


_EVIDENCE_RE = re.compile(r"^(tests/[\w./]+\.py)::([\w:]+)")


def test_every_replay_entry_cites_a_real_test():
    bad = []
    for q, (cls, evidence) in AUTHORSHIP.items():
        if cls != REPLAY:
            continue
        m = _EVIDENCE_RE.match(evidence)
        if not m:
            bad.append((q, evidence, "no file::test citation"))
            continue
        path = REPO / m.group(1)
        if not path.exists():
            bad.append((q, evidence, "file missing"))
            continue
        if not _test_exists(path, m.group(2).split("::")):
            bad.append((q, evidence, "test not found"))
    assert not bad, f"replay entries with unresolved evidence: {bad}"


def test_classes_are_valid_and_counts_recorded():
    classes = {cls for cls, _ in AUTHORSHIP.values()}
    assert classes <= {INDEPENDENT, REPLAY, NONE}
    n_rep = sum(1 for c, _ in AUTHORSHIP.values() if c == REPLAY)
    n_ind = sum(1 for c, _ in AUTHORSHIP.values() if c == INDEPENDENT)
    n_none = sum(1 for c, _ in AUTHORSHIP.values() if c == NONE)
    # the r10 audit snapshot — update alongside COVERAGE.md §authorship
    # when the catalog changes (the point is a loud diff, not a magic
    # number): replay entries are the ones the gate guards.
    assert n_none == 1
    assert n_rep + n_ind + n_none == len(AUTHORSHIP)


def _citation_grade(path: Path, parts: list[str], evidence: str) -> str:
    """Grade a replay citation: 'hypothesis' (the cited test is @given /
    randomized — a model property over a domain), 'finite-rationale'
    (the entry itself documents why only a finite table exists), or
    'unit' (neither — the grade r10's verdict named too weak to stand
    alone)."""
    if "FINITE-TABLE" in evidence:
        return "finite-rationale"
    src = path.read_text()
    tree = ast.parse(src)

    def _find_fn(name_parts):
        for n in tree.body:
            if isinstance(n, ast.FunctionDef) and n.name == name_parts[-1]:
                return n
            if (
                isinstance(n, ast.ClassDef)
                and len(name_parts) == 2
                and n.name == name_parts[0]
            ):
                for m in n.body:
                    if isinstance(m, ast.FunctionDef) and m.name == name_parts[1]:
                        return m
        return None

    fn = _find_fn(parts)
    if fn is None:
        return "unit"
    # ast.get_source_segment excludes decorators — inspect them directly
    deco = ast.dump(ast.Module(body=fn.decorator_list, type_ignores=[]))
    if "'given'" in deco or "'hypothesis'" in deco:
        return "hypothesis"
    seg = ast.get_source_segment(src, fn) or ""
    if "hypothesis" in seg or "st.data" in seg:
        return "hypothesis"
    if re.search(r"\brandom\b|\bRandom\b|\brng\b", seg):
        return "hypothesis"  # randomized brute-force reference = same grade
    return "unit"


def test_no_replay_citation_is_unit_grade():
    """r10 verdict item 2, mechanized as a standing gate: every replay
    entry's PRIMARY citation must be a hypothesis-grade model property
    (a @given/randomized test) or carry an explicit FINITE-TABLE
    rationale in the entry text.  A new replay oracle backed only by a
    directed unit fails the build instead of waiting for the next
    audit."""
    bad = []
    for q, (cls, evidence) in AUTHORSHIP.items():
        if cls != REPLAY:
            continue
        m = _EVIDENCE_RE.match(evidence)
        if not m:
            continue  # covered by test_every_replay_entry_cites_a_real_test
        path = REPO / m.group(1)
        if not path.exists():
            continue
        grade = _citation_grade(path, m.group(2).split("::"), evidence)
        if grade == "unit":
            bad.append((q, evidence[:80]))
    assert not bad, (
        "replay entries whose primary citation is unit-grade (add a "
        f"hypothesis model property or a FINITE-TABLE rationale): {bad}"
    )
