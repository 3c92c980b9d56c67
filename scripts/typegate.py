#!/usr/bin/env python3
"""Driver-parity type gate shared by check.py and bitsweep.py.

The driver canonicalizes both sides through pandas (`duckdb.df()` /
pyarrow), which WIDENS some DuckDB types: HUGEINT/UHUGEINT (sum() of
integers is promoted to HUGEINT and `.df()` maps it to float64, so the
cell renders `1500000.0` against the engine's int64 `1500000`) and
DECIMAL (also float64).  The local scripts read via `fetchall()`, which
yields native Python ints for HUGEINT — values compare equal locally
while the driver hash-mismatches.  Round 14 shipped 7 red rows this way
(q288/q295/q319/q328/q341/q348/q353, all bit-correct, all mistyped
oracles).

This gate DESCRIBEs both the oracle SQL and the engine parquet, maps
every DuckDB type to the class pandas would render it as, and hard-fails
on (a) any pandas-widened type on either side and (b) any class mismatch
between the two sides for the same column name.  The failure is now
local-first, at authoring time.

Builder-side tooling only — the engine itself has no python.
"""

# DuckDB type -> the equivalence class pandas rendering collapses it to.
_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_FLOAT = {"FLOAT", "DOUBLE", "REAL"}
# Types `duckdb.df()` widens to float64: values that are integral in
# fetchall() render with a trailing `.0` at the driver.
_WIDENED = {"HUGEINT", "UHUGEINT"}


def render_class(t):
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "float!widened"
    if t in _WIDENED:
        return "float!widened"
    # Nested/binary cells become numpy arrays / bytes in the driver's
    # pandas frame; `sort_values` -> `factorize` raises `unhashable
    # type` on them, so the driver row ERRORS instead of comparing
    # (round 15's q388 red: an ARRAY<STRING> output column). Third
    # recurrence of the local-passes/driver-fails class — hard-fail the
    # whole class: emit joined strings / hex instead (the q07 rule).
    if (t.endswith("[]") or t.startswith("LIST") or t.startswith("STRUCT")
            or t.startswith("MAP") or t.startswith("ARRAY")
            or t in ("BLOB", "BYTEA", "BINARY", "VARBINARY", "UNION")):
        return f"{t}!unsortable"
    if t in _INT:
        return "int"
    if t in _FLOAT:
        return "float"
    return t  # VARCHAR/DATE/TIMESTAMP/BOOLEAN: exact match


def describe(con, sql):
    """[(name, duckdb_type)] for an arbitrary SELECT, unexecuted rows."""
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    return [(r[0], r[1]) for r in rows]


def type_gate(con, name, oracle_sql, engine_glob):
    """Return a list of human-readable violations (empty == clean)."""
    bad = []
    try:
        o_desc = describe(con, oracle_sql)
        e_desc = describe(con, f"SELECT * FROM '{engine_glob}'")
    except Exception as e:  # the value compare will report unreadability
        return [f"type gate skipped: {e}"]
    # Duplicate column names collapse silently under dict(); the
    # driver's column-name sort would also be ambiguous — reject.
    for side, desc in (("oracle", o_desc), ("engine", e_desc)):
        names = [c for c, _ in desc]
        dups = sorted({c for c in names if names.count(c) > 1})
        for c in dups:
            bad.append(f"{side} has duplicate output column `{c}` — "
                       f"alias each occurrence uniquely")
    if bad:
        return bad
    o_types, e_types = dict(o_desc), dict(e_desc)
    for side, types in (("oracle", o_types), ("engine", e_types)):
        for c, t in sorted(types.items()):
            cls = render_class(t)
            if "widened" in cls:
                bad.append(
                    f"{side} column `{c}` is {t} — pandas widens it to "
                    f"float64 at the driver (cast ::BIGINT / ::DOUBLE)")
            if "unsortable" in cls:
                bad.append(
                    f"{side} column `{c}` is {t} — the driver's pandas "
                    f"row sort crashes on nested/binary cells "
                    f"(q388/r15); emit a joined string or hex instead")
    if sorted(o_types) == sorted(e_types):
        for c in sorted(o_types):
            oc, ec = render_class(o_types[c]), render_class(e_types[c])
            if oc != ec:
                bad.append(
                    f"column `{c}` renders as {ec} ({e_types[c]}) from the "
                    f"engine but {oc} ({o_types[c]}) from the oracle — "
                    f"driver hash would mismatch")
    return bad
