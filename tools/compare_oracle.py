#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL
in DuckDB over the testdata tables and compare with the Spark parquet
dumps produced by graft.Verify. Usage:
    python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    return v

def norm_table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(x.split("/")[-1] for x in glob.glob(f"{out_dir}/*")
                   if not x.endswith(".json"))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        tbl = pq.read_table(files[0])
        scols = tbl.column_names
        srows = [tuple(d[c] for c in scols) for d in tbl.to_pylist()]
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only)"); n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        sc, sr = norm_table(scols, srows)
        oc, orr = norm_table(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: cols spark={sc} oracle={oc}"); n_fail += 1; continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: rows spark={len(sr)} oracle={len(orr)}"); n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, orr) if a != b]
        if bad:
            print(f"FAIL  {name}: {len(bad)}/{len(sr)} mismatched rows; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
