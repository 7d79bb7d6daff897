#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles and compare (columns sorted by name,
row-order-sensitive, exact values). Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    declared = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(os.path.join(out_dir, d)))
    for name in declared:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no parquet output"); n_bad += 1; continue
        mine = pq.read_table(files[0]).to_pandas()
        mine = mine[sorted(mine.columns)]
        if name not in oracles:
            print(f"[ROWS] {name}: no oracle, rows={len(mine)}")
            continue
        try:
            ref = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_bad += 1; continue
        ref = ref[sorted(ref.columns)]
        if list(mine.columns) != list(ref.columns):
            print(f"[FAIL] {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            n_bad += 1; continue
        if len(mine) != len(ref):
            print(f"[FAIL] {name}: rows {len(mine)} != {len(ref)}"); n_bad += 1; continue
        bad_cols = []
        for c in mine.columns:
            a, b = mine[c], ref[c]
            try:
                same = (a.astype(object).where(a.notna(), None).tolist()
                        == b.astype(object).where(b.notna(), None).tolist())
            except Exception:
                same = False
            if not same:
                bad_cols.append(c)
        if bad_cols:
            print(f"[FAIL] {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                for i in range(len(mine)):
                    av = mine[c].iloc[i]; bv = ref[c].iloc[i]
                    if (av != bv) and not (av != av and bv != bv):
                        print(f"    row {i} col {c}: mine={av!r} ref={bv!r}")
                        break
            n_bad += 1
        else:
            print(f"[ OK ] {name}: {len(mine)} rows"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {len(declared)} declared")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
