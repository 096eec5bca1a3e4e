#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and compares:
columns sorted by name, rows sorted by all columns, values hashed.
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Result-column types that survive every fetch path (fetchall, pandas,
# arrow) with identical value rendering. DuckDB types sum(INTEGER/BIGINT)
# and windowed SUM() as HUGEINT, which a pandas-based compare converts to
# float64 ("32.0" != "32") — the exact mechanism behind the r11–r13
# driver-red rows t43/t56/q145/t60, which passed here because fetchall
# yields Python ints. Any oracle whose DESCRIBE shows a non-portable
# result type is now a hard FAIL even when the values match.
#
# THIS set is authoritative for what an oracle may return. It is
# deliberately stricter than tools/evidence.py's render() whitelist
# (which accepts Decimal): evidence.py fingerprints rows already fetched
# into Python, where Decimal's str() is deterministic — fine for
# jvm-vs-py adjudication — but an oracle RESULT column typed DECIMAL
# still risks scale/trailing-zero rendering drift through the driver's
# pandas-based fetch vs Spark's parquet decimals, so DECIMAL stays
# excluded here. Cast oracle outputs to DOUBLE/BIGINT instead.
PORTABLE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT",
                  "UINTEGER", "USMALLINT", "UTINYINT", "DOUBLE", "FLOAT",
                  "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB"}

def unportable(rel):
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t).split("(")[0] not in PORTABLE_TYPES]

def canon(rows, cols):
    # sort columns by name, then rows; stringify values for a stable hash
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)  # exact double repr
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return sorted(c for c in cols), out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        gcols, grows = canon(got.fetchall(), [d[0] for d in got.description])
        try:
            exp = con.sql(sql)
            bad_types = unportable(exp)
            ecols, erows = canon(exp.fetchall(), [d[0] for d in exp.description])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if bad_types:
            print(f"FAIL {name}: non-portable oracle result type(s) "
                  f"{bad_types} — add explicit CASTs (pandas-based "
                  f"compares render these differently)")
            n_fail += 1
        elif gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
        elif grows != erows:
            # symmetric difference, not zip: one inserted/dropped row would
            # misalign every subsequent pair and bury the real culprit
            gset, eset = set(grows), set(erows)
            only_g = sorted(gset - eset)[:5]
            only_e = sorted(eset - gset)[:5]
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows; "
                  f"spark-only rows: {only_g}; oracle-only rows: {only_e}")
            if not only_g and not only_e:
                # same multiset membership but different multiplicities
                from collections import Counter
                cg, ce = Counter(grows), Counter(erows)
                mult = [(r, cg[r], ce[r]) for r in cg if cg[r] != ce[r]][:5]
                print(f"     multiplicity diffs (row, spark_n, oracle_n): {mult}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
