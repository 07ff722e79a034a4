#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

For each query dumped by graft.Verify: register the sf parquet tables in
DuckDB, run the oracle SQL, load the Spark parquet result, sort columns by
name, canonicalize rows (sorted), and diff. Dev-only tool — the shipped
Scala library never uses Python.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None))
    return rows


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            expected = con.sql(sql).df()
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            ec, gc = canon(expected), canon(got)
            if sorted(expected.columns.str.lower()) != sorted(got.columns.str.lower()):
                print(f"FAIL {name}: columns {sorted(expected.columns)} vs {sorted(got.columns)}")
                n_fail += 1
            elif ec == gc:
                print(f"pass {name} ({len(gc)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: rows {len(ec)} vs {len(gc)}")
                diff = [(a, b) for a, b in zip(ec, gc) if a != b][:3]
                for a, b in diff:
                    print(f"   oracle: {a}\n   spark : {b}")
                if len(ec) != len(gc):
                    eset, gset = set(ec), set(gc)
                    print("   only-oracle:", list(eset - gset)[:3])
                    print("   only-spark :", list(gset - eset)[:3])
        except Exception as ex:
            n_fail += 1
            print(f"ERROR {name}: {ex}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
