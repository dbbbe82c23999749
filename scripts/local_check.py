#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle gate.

Runs each oracle_sql.json query in DuckDB over the sfDir tables and compares
with the parquet that graft.Verify wrote: sorts columns by name, sorts rows,
compares values (exact for ints/strings, tiny tolerance for floats).

Usage: python3 scripts/local_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                rr.append(round(v, 9))
            elif isinstance(v, list):
                rr.append(tuple(round(x, 9) if isinstance(x, float) else x for x in v))
            else:
                rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify emits each oracle under both '<name>' and '<name>.parquet';
    # dedupe to bare names, then accept either artifact-dir layout.
    dedup = {}
    for k, v in oracle.items():
        dedup[k[:-8] if k.endswith(".parquet") else k] = v
    n_pass = n_fail = 0
    for name, sql in sorted(dedup.items()):
        art = f"{out_dir}/{name}.parquet"
        if not os.path.isdir(art):
            art = f"{out_dir}/{name}"
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
            sp = con.execute(f"SELECT * FROM read_parquet('{art}/*.parquet')")
            scols = [d[0] for d in sp.description]
            srows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        if dc != sc:
            print(f"FAIL {name}: columns differ duck={dc} spark={sc}")
            n_fail += 1
            continue
        if len(dr) != len(sr):
            print(f"FAIL {name}: rowcount duck={len(dr)} spark={len(sr)}")
            n_fail += 1
            continue
        bad = None
        for a, b in zip(dr, sr):
            if a != b:
                ok = len(a) == len(b)
                if ok:
                    for x, y in zip(a, b):
                        if isinstance(x, float) and isinstance(y, float):
                            if not (math.isclose(x, y, rel_tol=1e-7, abs_tol=1e-7)
                                    or (math.isnan(x) and math.isnan(y))):
                                ok = False
                                break
                        elif x != y:
                            ok = False
                            break
                if not ok:
                    bad = (a, b)
                    break
        if bad:
            print(f"FAIL {name}: first diff\n  duck : {bad[0]}\n  spark: {bad[1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(dr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
