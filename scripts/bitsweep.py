#!/usr/bin/env python3
"""Bit-level sweep of engine outputs vs DuckDB oracles — the judge's
methodology, strictly stronger than check.py's rounded canonical form.

Usage: python3 scripts/bitsweep.py <sfDir> <outDir> [query ...]

Where check.py formats floats at 6 dp (two different raw doubles can
format identically and pass), this sweep compares every float by its
IEEE-754 bit pattern (struct '>d'), so it distinguishes -0.0 from +0.0,
NaN payloads, and 1-ulp differences. The engine's determinism idiom
(integer grids inside kernels + round(...,6) on both sides + the
signed-zero `+ 0.0` oracle guard) promises BIT-identical outputs, not
merely 6-dp-equal ones — this script checks that promise.

Builder-side tooling only — the engine itself has no python.
"""
import json
import math
import struct
import sys

import duckdb

from typegate import type_gate

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell(v):
    if isinstance(v, float):
        return struct.pack(">d", v).hex()
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(cell(x) for x in v) + "]"
    if v is None:
        return "∅"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
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
        # Driver-parity type gate FIRST (fetchall() hides pandas
        # widening, e.g. HUGEINT -> float64).  See typegate.py.
        violations = type_gate(
            con, name, sql, f"{out_dir}/{name}/*.parquet")
        if violations:
            for v in violations:
                print(f"FAIL {name}: {v}")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            exp = con.execute(sql)
            e_cols = [d[0] for d in exp.description]
            e_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
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
            msg = f"rows {len(gr)} vs {len(er)}, {len(diffs)} differing"
            if diffs:
                i = diffs[0]
                msg += f"; first diff row {i}:\n  engine {gr[i]}\n  oracle {er[i]}"
            print(f"FAIL {name}: {msg}")
        else:
            print(f"PASS {name} ({len(gr)} rows, bit-identical)")
            n_pass += 1
    print(f"== {n_pass} bit-identical, {n_fail} differ ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
