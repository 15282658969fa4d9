#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet under OUTDIR, run the matching oracle SQL in DuckDB over the sf
tables and compare rows / schema / values (column-name-sorted, row-sorted).

Usage: compare_oracle.py <sfdir> <outdir>
"""
import json, os, sys
import duckdb

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{qdir}/*.parquet'").df()
        except Exception as e:
            results[name] = {"error": f"spark result unreadable: {e}"}
            continue
        if name not in oracles:
            results[name] = {"rows": len(spark_df), "oracle": "none (rows-only)",
                             "ok": len(spark_df) > 0}
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = {"error": f"oracle failed: {e}"}
            continue
        s, o = canon(spark_df), canon(oracle_df)
        rows_ok = len(s) == len(o)
        schema_ok = list(s.columns) == list(o.columns) and \
            all(str(a) == str(b) for a, b in zip(s.dtypes, o.dtypes))
        try:
            vals_ok = rows_ok and list(s.columns) == list(o.columns) and \
                s.equals(o.astype(s.dtypes.to_dict()))
        except Exception:
            vals_ok = False
        results[name] = {"rows": rows_ok, "schema": schema_ok, "hash": vals_ok,
                         "n_spark": len(s), "n_oracle": len(o)}
        if not vals_ok and rows_ok and len(s) > 0:
            # show first mismatching row for debugging
            try:
                import pandas as pd
                merged = s.compare(o.astype(s.dtypes.to_dict()))
                if len(merged):
                    results[name]["first_diff"] = merged.head(3).to_string()[:500]
            except Exception as e:
                results[name]["diff_err"] = str(e)[:200]
    ok = sum(1 for r in results.values()
             if r.get("hash") or (r.get("oracle") and r.get("ok")))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{ok}/{len(results)} fully OK")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
