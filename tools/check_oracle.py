#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (dev tool only; the
engine itself is pure Scala/Spark). Usage:
  python3 tools/check_oracle.py /tmp/verify_r2 /root/testdata/sf0.01 [query ...]
"""
import json, sys, hashlib
import duckdb, pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        s = str(v)
        # DATE columns come back as datetime.date from Spark parquet but
        # datetime64 midnight from DuckDB — same value, different repr.
        if s.endswith(" 00:00:00"):
            s = s[:-9]
        return s
    rows = df.apply(lambda r: "|".join(cell(x) for x in r), axis=1)
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    # a requested query with no oracle entry must be loud, not silently green
    for q in only - set(oracles):
        print(f"{q}: NO ORACLE ENTRY (rows-only in the real gate)")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    bad = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pq.read_table(f"{outdir}/{name}").to_pandas()
        except Exception as e:
            print(f"{name}: SPARK READ FAIL {e}"); bad.append(name); continue
        try:
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE FAIL {e}"); bad.append(name); continue
        rows_ok = len(spark_df) == len(ora_df)
        schema_ok = sorted(map(str.lower, spark_df.columns)) == sorted(map(str.lower, ora_df.columns))
        spark_df.columns = [c.lower() for c in spark_df.columns]
        ora_df.columns = [c.lower() for c in ora_df.columns]
        hash_ok = rows_ok and schema_ok and canon(spark_df) == canon(ora_df)
        status = "OK" if hash_ok else f"MISMATCH rows={rows_ok} schema={schema_ok}"
        if not hash_ok:
            bad.append(name)
        print(f"{name}: {status} ({len(spark_df)} vs {len(ora_df)})")
    print("FAILED:", bad if bad else "none")

if __name__ == "__main__":
    main()
