#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the raw parquet
tables in <sfDir>, and compares: column names (sorted), row count, and
values (rows sorted, floats rounded). Prints PASS/FAIL per query.
"""
import json, math, sys
from pathlib import Path

import duckdb


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_rows(cols, rows):
    # sort columns by name, then rows lexicographically (driver-style)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"SKIP {name}: rows={len(got)} (no oracle, rows-only check)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gr = norm_rows(got_cols, got)
        ec, er = norm_rows(exp_cols, exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif gr != er:
            diff_i = next((i for i, (a, b) in enumerate(zip(gr, er)) if a != b),
                          min(len(gr), len(er)))
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}; first diff @ {diff_i}:")
            print(f"   got: {gr[diff_i] if diff_i < len(gr) else '<none>'}")
            print(f"   exp: {er[diff_i] if diff_i < len(er) else '<none>'}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(gr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
