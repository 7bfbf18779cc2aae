#!/usr/bin/env python3
"""Dev-only self-check replicating the driver's DuckDB-oracle compare:
runs Verify's dumped oracle_sql.json against DuckDB over the same
parquet tables and hash-compares with the dumped parquet results
(columns sorted by name, rows in dumped order)."""
import sys, json, glob, hashlib
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string repr with float rounding
    def cell(v):
        if isinstance(v, float): return f"{v:.6f}"
        return repr(v)
    return hashlib.md5("\n".join(",".join(cell(v) for v in row) for row in df.itertuples(index=False)).encode()).hexdigest()

fails, passes, skips = [], [], []
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark dump")); continue
    try:
        mine = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    except Exception as e:
        fails.append((name, f"read dump: {e}")); continue
    try:
        ref = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"duckdb: {e}")); continue
    if len(mine) != len(ref):
        fails.append((name, f"rows {len(mine)} vs {len(ref)}")); continue
    if sorted(map(str.lower, mine.columns)) != sorted(map(str.lower, ref.columns)):
        fails.append((name, f"cols {sorted(mine.columns)} vs {sorted(ref.columns)}")); continue
    mine.columns = [c.lower() for c in mine.columns]; ref.columns = [c.lower() for c in ref.columns]
    h1, h2 = canon(mine), canon(ref)
    if h1 != h2:
        # find first differing row for debugging
        m = mine.reindex(sorted(mine.columns), axis=1); r = ref.reindex(sorted(ref.columns), axis=1)
        diff = None
        for i in range(min(len(m), 2000000)):
            if list(map(repr, m.iloc[i])) != list(map(repr, r.iloc[i])):
                diff = (i, list(m.iloc[i]), list(r.iloc[i])); break
        fails.append((name, f"hash mismatch; first diff row {diff}"))
    else:
        passes.append(name)

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name not in oracle:
        n = len(pd.concat([pd.read_parquet(f) for f in glob.glob(d+"*.parquet")], ignore_index=True)) if glob.glob(d+"*.parquet") else 0
        skips.append((name, n))

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"ROWS-ONLY {len(skips)}: {' '.join(f'{n}={c}' for n,c in skips)}")
print(f"FAIL {len(fails)}:")
for name, why in fails:
    print(f"  {name}: {str(why)[:500]}")
sys.exit(1 if fails else 0)
