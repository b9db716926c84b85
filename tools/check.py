#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run oracle_sql.json in
DuckDB over the sf parquet tables and diff against the Verify parquet dumps
(columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: read error {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        try:
            g, w = canon(got), canon(want)
        except Exception as e:
            print(f"FAIL {name}: canon error {e}")
            n_fail += 1
            continue
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        # value compare with dtype normalization
        mismatch = None
        for c in g.columns:
            a = g[c]
            b = w[c]
            try:
                if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                    # exact float equality is intentional (decimal-exact
                    # oracle design); on mismatch report the max abs delta
                    # so near-misses are diagnosable
                    ok = ((a.isna() & b.isna()) | (a == b)).all()
                    if not ok:
                        try:
                            delta = (a.astype(float) - b.astype(float)).abs().max()
                            print(f"  [{name}.{c}] max abs delta = {delta}")
                        except Exception:
                            pass
                else:
                    both_na = a.isna() & b.isna()
                    ok = (both_na | (a.astype(str) == b.astype(str))).all()
            except Exception as e:
                ok = False
            if not ok:
                diff_idx = None
                try:
                    neq = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
                    diff_idx = neq[neq].index[:3].tolist()
                except Exception:
                    pass
                mismatch = (c, diff_idx, a.head(3).tolist(), b.head(3).tolist())
                break
        if mismatch:
            c, idx, ah, bh = mismatch
            print(f"FAIL {name}: col {c} differs at rows {idx}")
            if idx:
                for i in idx:
                    print(f"   got={g[c].iloc[i]!r} want={w[c].iloc[i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
