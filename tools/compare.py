#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's t2 gate: run each
oracle_sql.json statement in DuckDB over the testdata parquet tables,
load the corresponding Spark parquet dump, sort columns by name, and
compare values. Usage: compare.py <sfDir> <verifyOutDir> [query...]"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def frame_rows(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = cur.fetchall()
    return [cols[i] for i in order], [tuple(canon(r[i]) for i in order) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; ScaleGen output is a
        # directory of part files — glob in that case
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ocols, orows = frame_rows(con.execute(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, srows = frame_rows(
            con.execute(f"SELECT * FROM read_parquet({files})"))
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        if orows == srows:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
            continue
        n_fail += 1
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(orows, srows)) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(orows)} rows differ; first:")
            for i, a, b in diffs[:3]:
                print(f"  row {i}\n   oracle={a}\n   spark ={b}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
