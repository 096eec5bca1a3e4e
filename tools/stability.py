#!/usr/bin/env python3
"""Cross-run determinism gate (the t43 class of failure).

Usage: python3 tools/stability.py <verifyOutDirA> <verifyOutDirB> [...more dirs]

Compares two or more Verify output directories query-by-query: each
query's parquet rows are canonicalized exactly like the driver's compare
(columns sorted by name, rows sorted, values stringified) and hashed.
Any query whose hash differs between runs — e.g. runs taken at different
SPARK_GRAFT_CPUS or with AQE toggled — is an operator whose output
depends on partitioning/parallelism, and must fail HERE before the
driver's correctness gate ever sees it.

Exit 0 = every query hash-identical across all dirs; 1 otherwise.
"""
import glob, hashlib, os, sys
import duckdb


def canon_hash(con, res_dir):
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        return None
    got = con.sql(f"SELECT * FROM read_parquet({files!r})")
    cols = [d[0] for d in got.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        tuple(repr(r[i]) if isinstance(r[i], float) else str(r[i])
              for i in order)
        for r in got.fetchall())
    h = hashlib.sha256()
    h.update("\x1f".join(sorted(cols)).encode())
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest(), len(rows)


def main(dirs):
    con = duckdb.connect()
    names = sorted({os.path.basename(p)
                    for d in dirs for p in glob.glob(f"{d}/*")
                    if os.path.isdir(p)})
    n_bad = 0
    for name in names:
        results = [(d, canon_hash(con, f"{d}/{name}")) for d in dirs]
        missing = [d for d, r in results if r is None]
        hashes = {r[0] for _, r in results if r is not None}
        if missing:
            print(f"FAIL {name}: no output in {missing}")
            n_bad += 1
        elif len(hashes) > 1:
            detail = ", ".join(f"{d}={r[0][:12]}({r[1]} rows)"
                               for d, r in results)
            print(f"FAIL {name}: hash varies across runs: {detail}")
            n_bad += 1
        else:
            print(f"PASS {name}")
    print(f"== {len(names) - n_bad} stable, {n_bad} unstable "
          f"across {len(dirs)} runs")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
