#!/usr/bin/env python3
"""Three-way adjudicator for a red driver correctness row (VERDICT r12 #1).

The canonical multiset fingerprint (Verify.canonFingerprint's recipe):
columns sorted by name; each value rendered to string (null -> "\\x00NULL",
binary -> uppercase hex); values joined with \\x01; row hash = first 15 hex
chars of md5 as an int; fingerprint = (count, sum mod 2^64, xor) over row
hashes. Order-independent: depends only on the row multiset.

Modes:
  expect <outDir> <expectFile>
      Collect every <outDir>/<name>/_canon.json (written by a Verify run
      with SPARK_GRAFT_EVIDENCE=1, the default) into the committed
      expectation file: one line per query, "name n sumHex xorHex".
      Run after ANY query change, against a fresh full Verify at sf0.01:
        python3 tools/evidence.py expect /tmp/vout tools/expected_canon_sf0.01.txt

  adjudicate <sfDir> <outDir> [query ...]
      For each query (default: all with a _canon.json), report:
        jvm-vs-expect : Verify's JVM fingerprint vs the committed
                        expectation (same-recipe, same-engine -> a
                        mismatch means Spark's row multiset CHANGED);
        spark-vs-oracle : Python-canon of the result parquet vs
                        Python-canon of the DuckDB oracle result
                        (same renderer both sides -> exact);
        jvm-vs-py     : for PORTABLE schemas (int/str/bool/date/decimal)
                        the Python fingerprint of the parquet must equal
                        the JVM one — a cross-language recipe check.
      A driver-red row then reads: jvm==expect and spark==oracle here
      -> the divergence happened on the driver's DuckDB/compare side;
      jvm!=expect -> Spark-side, and _canon.json's sample_min rows say
      which rows moved.
"""
import glob
import hashlib
import json
import os
import sys
from decimal import Decimal

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
MOD = 1 << 64

def render(v, portable):
    # known-portable types are whitelisted; anything unrecognized
    # (datetime, date, UUID, ...) is rendered best-effort but marks the
    # schema non-portable, so the jvm-vs-py check is SKIPPED rather than
    # reporting a spurious MISMATCH on a repr difference.
    # NOTE: Decimal is portable HERE (str() of a fetched Decimal is
    # deterministic for jvm-vs-py adjudication) but is NOT an allowed
    # oracle result type — tools/compare.py's PORTABLE_TYPES is the
    # authoritative gate for what an oracle may return (see its comment).
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):          # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex().upper()
    if isinstance(v, float):
        portable[0] = False
        return repr(v)
    if not isinstance(v, (int, str, Decimal)):
        portable[0] = False
    return str(v)


def canon_fp(rows, cols):
    """(n, sum_hex, xor_hex, sample_min, portable) over a row iterable."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    portable = [True]
    n, s, x = 0, 0, 0
    sample = []
    for r in rows:
        rs = "\x01".join(render(r[i], portable) for i in order)
        h15 = hashlib.md5(rs.encode("utf-8", "surrogatepass")).hexdigest()[:15]
        h = int(h15, 16)
        n += 1
        s = (s + h) % MOD
        x ^= h
        sample.append((h15, rs))
        if len(sample) > 64:
            sample.sort()
            del sample[12:]
    sample.sort()
    return n, format(s, "x"), format(x, "x"), sample[:12], portable[0]


def load_expect(path):
    out = {}
    if os.path.exists(path):
        for line in open(path):
            parts = line.split()
            if len(parts) == 4:
                out[parts[0]] = (int(parts[1]), parts[2], parts[3])
    return out


def mode_expect(out_dir, expect_file):
    lines = []
    for p in sorted(glob.glob(f"{out_dir}/*/_canon.json")):
        c = json.load(open(p))
        lines.append(f"{c['query']} {c['n']} {c['sum']} {c['xor']}\n")
    with open(expect_file, "w") as f:
        f.writelines(lines)
    print(f"wrote {len(lines)} fingerprints to {expect_file}")
    return 0


def mode_adjudicate(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    expect = load_expect(os.path.join(os.path.dirname(__file__),
                                      f"expected_canon_{sf_tag}.txt"))
    if not names:
        names = sorted(os.path.basename(os.path.dirname(p))
                       for p in glob.glob(f"{out_dir}/*/_canon.json"))
    bad = 0
    for name in names:
        cpath = f"{out_dir}/{name}/_canon.json"
        if not os.path.exists(cpath):
            print(f"{name}: no _canon.json (run Verify with evidence on)")
            bad += 1
            continue
        jvm = json.load(open(cpath))
        jfp = (jvm["n"], jvm["sum"], jvm["xor"])
        verdicts = []
        if name in expect:
            verdicts.append("jvm-vs-expect: " +
                            ("MATCH" if expect[name] == jfp else
                             f"MISMATCH (expect {expect[name]}, got {jfp})"))
        else:
            verdicts.append("jvm-vs-expect: no-expectation")
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        gfp = canon_fp(got.fetchall(), [d[0] for d in got.description])
        if gfp[4]:
            verdicts.append("jvm-vs-py: " +
                            ("MATCH" if (gfp[0], gfp[1], gfp[2]) == jfp
                             else f"MISMATCH (py {gfp[:3]}, jvm {jfp})"))
        else:
            verdicts.append("jvm-vs-py: non-portable-schema (skipped)")
        if name in oracle:
            exp = con.sql(oracle[name])
            efp = canon_fp(exp.fetchall(), [d[0] for d in exp.description])
            if gfp[:3] == efp[:3]:
                verdicts.append("spark-vs-oracle: MATCH")
            else:
                verdicts.append(f"spark-vs-oracle: MISMATCH "
                                f"(spark {gfp[:3]}, oracle {efp[:3]})")
                s_only = [r for r in gfp[3] if r not in efp[3]][:3]
                o_only = [r for r in efp[3] if r not in gfp[3]][:3]
                verdicts.append(f"  spark-only-min-rows: {s_only}")
                verdicts.append(f"  oracle-only-min-rows: {o_only}")
        else:
            verdicts.append("spark-vs-oracle: no-oracle")
        ok = all(("MISMATCH" not in v) for v in verdicts)
        if not ok:
            bad += 1
        print(f"{name}: {'OK' if ok else 'DIVERGED'}")
        for v in verdicts:
            print(f"  {v}")
    return 1 if bad else 0


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "expect":
        sys.exit(mode_expect(sys.argv[2], sys.argv[3]))
    elif len(sys.argv) >= 4 and sys.argv[1] == "adjudicate":
        sys.exit(mode_adjudicate(sys.argv[2], sys.argv[3], sys.argv[4:]))
    else:
        print(__doc__)
        sys.exit(2)
