#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet dumps produced by graft.Verify and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB with views over
the same parquet tables, canonicalizes both sides (columns sorted by
name, rows sorted by all columns, floats rounded) and diffs.

This is builder-side tooling only — the engine itself has no python.
"""
import json
import math
import sys

import duckdb

from typegate import type_gate

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Column-name-sorted, row-sorted, float-rounded canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # NO signed-zero normalization here: the driver's hash is
            # sign-sensitive, so the mimic must distinguish -0.0 from
            # +0.0 too (a `+ 0.0` here masked q88's one-bit red row for
            # two rounds). Oracles normalize with `round(...) + 0.0`.
            return f"{round(v, 6):.6f}"
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, list):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        # Driver-parity type gate FIRST: fetchall() hides pandas
        # widening (HUGEINT -> float64), so value equality below is
        # necessary but not sufficient.  See typegate.py.
        violations = type_gate(
            con, name, sql, f"{out_dir}/{name}/*.parquet")
        if violations:
            for v in violations:
                print(f"FAIL {name}: {v}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: engine output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql)
            e_cols = [d[0] for d in exp.description]
            e_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # Driver-parity sortability probe: the driver sorts a pandas
        # frame on all columns; nested/binary cells crash factorize
        # there even when our string-rendering canon below is happy.
        try:
            df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            df.sort_values(by=sorted(df.columns), inplace=True)
        except Exception as e:
            print(f"FAIL {name}: driver pandas sort would crash: {e}")
            n_fail += 1
            continue
        gc, gr = canon(g_rows, g_cols)
        ec, er = canon(e_rows, e_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            diffs = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b]
            msg = f"rows {len(gr)} vs {len(er)}"
            if diffs:
                i = diffs[0]
                msg += f"; first diff row {i}:\n  engine {gr[i]}\n  oracle {er[i]}"
            elif len(gr) != len(er):
                a, b = (gr, er) if len(gr) > len(er) else (er, gr)
                extra = [r for r in a if r not in b][:2]
                msg += f"; extra rows {extra}"
            print(f"FAIL {name}: {msg}")
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
