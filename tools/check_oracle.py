#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every query in
<verifyOutDir>/oracle_sql.json, and compares against the Spark result
parquet at <verifyOutDir>/<name>/ — row count, sorted column names,
sorted column TYPES (the driver hashes typed values: a DuckDB HUGEINT
sum vs a Spark BIGINT both fetch as python int but hash differently,
which is exactly the r1 q10/q21/q38 failure mode), and the multiset of
rows with strict equality (floats must be bit-equal; any drift is a
FAIL so local replay predicts the driver gate).

Dev tool only — uses driver-side python packages, not part of the
Scala library.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def rows_key(row):
    return tuple(str(x) for x in row)


def compare(name, spark_rows, oracle_rows, cols):
    if len(spark_rows) != len(oracle_rows):
        return f"ROWCOUNT spark={len(spark_rows)} oracle={len(oracle_rows)}"
    s = sorted(spark_rows, key=rows_key)
    o = sorted(oracle_rows, key=rows_key)
    for sr, orow in zip(s, o):
        for a, b in zip(sr, orow):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    denom = max(abs(a), abs(b), 1e-300)
                    return f"FLOAT mismatch relerr={abs(a - b) / denom:.2e}: {sr} vs {orow}"
            elif a != b or type(a) is not type(b):
                return f"VALUE mismatch: {sr} ({[type(x).__name__ for x in sr]}) vs {orow} ({[type(x).__name__ for x in orow]})"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ocur = con.sql(sql)
            ocols = [c.lower() for c in ocur.columns]
            order = sorted(range(len(ocols)), key=lambda i: ocols[i])
            otypes = [str(ocur.types[i]) for i in order]
            orows = [tuple(r[i] for i in order) for r in ocur.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            scur = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [c.lower() for c in scur.columns]
            sorder = sorted(range(len(scols)), key=lambda i: scols[i])
            stypes = [str(scur.types[i]) for i in sorder]
            srows = [tuple(r[i] for i in sorder) for r in scur.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: COLS spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        if otypes != stypes:
            mism = [f"{c}: spark={st} oracle={ot}"
                    for c, st, ot in zip(sorted(scols), stypes, otypes) if st != ot]
            print(f"FAIL {name}: TYPES {'; '.join(mism)}")
            n_fail += 1
            continue
        err = compare(name, srows, orows, sorted(scols))
        if err is None:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        elif err.startswith("float-ulp"):
            print(f"WARN {name}: {err} ({len(srows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {err}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
