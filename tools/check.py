#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet under OUT_DIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over the same sf tables, sort columns by name + rows by value, and
compare. Usage: check.py <sfDir> <outDir> [query ...]"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [cols[i] for i in order], sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t))


def tclass(t):
    """Coarse type class for spark-vs-oracle parity. Both sides are read
    through DuckDB, so the classes are directly comparable. HUGEINT and
    DECIMAL are their own classes: DuckDB silently promotes integer
    SUM/product chains to HUGEINT (round-6 q47/q78/q80/q82) and integer
    division/AVG to DECIMAL — both hash differently from Spark's
    BIGINT/DOUBLE even when every value is equal. The substring check
    recurses into STRUCT/LIST/MAP child types via str(t) (round-7 ADVICE
    item 1)."""
    s = str(t).upper()
    if "HUGEINT" in s:
        return "hugeint"
    if "DECIMAL" in s:
        return "decimal"
    if any(k in s for k in ("STRUCT", "MAP", "[]", "LIST")):
        return "nested"
    if any(k in s for k in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                            "UTINYINT", "USMALLINT", "UINTEGER",
                            "UBIGINT")):
        return "int"
    if any(k in s for k in ("DOUBLE", "FLOAT", "REAL")):
        return "float"
    if "TIMESTAMP" in s:
        return "timestamp"
    if "DATE" in s:
        return "date"
    if "VARCHAR" in s or "STRING" in s:
        return "string"
    return s


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
        return float(a) == float(b)
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            o_rel = con.sql(sql)
            # The driver's hasher is type-sensitive in ways fetchall() hides
            # (round-6 q47/q78/q80/q82): fail loudly on any per-column type-
            # CLASS mismatch between the spark parquet and the oracle —
            # HUGEINT/DECIMAL promotions included, nested types included
            # (tclass recurses via the type's string form).
            s_types = {c.lower(): tclass(t)
                       for c, t in zip(spark_rel.columns, spark_rel.types)}
            bad_t = [(c, s_types.get(c.lower()), tclass(t))
                     for c, t in zip(o_rel.columns, o_rel.types)
                     if s_types.get(c.lower()) is not None
                     and s_types.get(c.lower()) != tclass(t)]
            if bad_t:
                print(f"FAIL {name}: type-class mismatch (col, spark, "
                      f"oracle): {bad_t} - CAST the oracle column "
                      f"(HUGEINT/DECIMAL promotions hash differently even "
                      f"when values are equal)")
                n_fail += 1
                continue
            o_cols, o_rows = canon(o_rel.fetchall(), o_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            for j, (a, b) in enumerate(zip(sr, orow)):
                if not eq(a, b):
                    bad = (i, s_cols[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
