#!/usr/bin/env python3
"""Local pre-check mimicking the driver's t2 gate: compare Verify's parquet
dumps against DuckDB running SparkEntry.oracleSql over the same tables.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb

def canon(rows, cols):
    """Sort columns by name (driver semantics), stringify values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    rr.append("NaN")
                else:
                    rr.append(repr(v))
            else:
                rr.append(repr(v))
        out.append(tuple(rr))
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = got.columns, got.fetchall()
            exp = con.sql(sql)
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i in range(len(gr)) if gr[i] != er[i])
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  cols   {gc}")
            print(f"  spark  {gr[bad]}")
            print(f"  oracle {er[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
