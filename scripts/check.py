#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet dump written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
fixture tables in <sfDir>, and compares row count, column names, and a
hash over column-name-sorted, row-sorted values — the same discipline
TESTDATA.md describes for the driver gate.
"""
import json
import sys
from pathlib import Path

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            # Known limitation (accepted): string-rounding floats can
            # split values within 1e-9 of a rounding boundary, and an
            # int on one engine vs float on the other ('5' vs '5.0')
            # hash-mismatches even when numerically equal. The oracle
            # discipline (integer/string/decimal outputs only; the few
            # float columns are exact IEEE arithmetic, e.g. median of
            # ints) is what keeps this a non-issue — keep it that way
            # when adding oracles rather than loosening the compare.
            if isinstance(v, float):
                v = repr(round(v, 9))
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return "\x1e".join(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    unknown = only - set(oracle)
    if unknown:
        # a typo'd filter must not read as a clean pass
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        sys.exit(1)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            s = con.execute(
                f"SELECT * FROM '{spark_dir}/*.parquet'")
            s_rows, s_cols = s.fetchall(), [d[0] for d in s.description]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable {e}")
            n_bad += 1
            continue
        try:
            o = con.execute(oracle[name])
            o_rows, o_cols = o.fetchall(), [d[0] for d in o.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_bad += 1
            continue
        ok_rows = len(s_rows) == len(o_rows)
        ok_cols = sorted(s_cols) == sorted(o_cols)
        ok_hash = ok_cols and canon(s_rows, s_cols) == canon(o_rows, o_cols)
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS {name} ({len(s_rows)} rows)")
        else:
            n_bad += 1
            print(f"FAIL {name}: rows {len(s_rows)}/{len(o_rows)} "
                  f"cols_match={ok_cols} hash_match={ok_hash}")
            if ok_cols and not ok_hash and len(s_rows) < 50:
                # canon handles NULLs and aligns both sides on the same
                # (name-sorted) column order; raw tuples would neither
                # sort (None < int raises) nor line up positionally
                print("  spark:", canon(s_rows, s_cols).split("\x1e")[:5])
                print("  oracle:", canon(o_rows, o_cols).split("\x1e")[:5])
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
