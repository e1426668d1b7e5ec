#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Reads /tmp/verify_out/<name>/ parquet (Spark result) and runs
oracle_sql.json in DuckDB against the sf dir's parquet tables, then
compares: row count, column names (sorted), and cell values (rows
sorted, columns sorted by name). Prints PASS/FAIL per query.
"""
import sys, json, glob, math, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3].split(",") if len(sys.argv) > 3 and sys.argv[3] != "-" else None
# Optional 4th arg: write a CORRECTNESS-style JSON artifact (per-query
# status + rows, including rows-only queries that have no oracle SQL)
# so scale-up compares are a checked-in record, not a claim.
json_out = sys.argv[4] if len(sys.argv) > 4 else None
results = {}

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# Verify-recorded per-query failures (exceptions at plan/run time):
# surface the real message instead of a bare "no spark output".
errors = {}
if os.path.exists(f"{outdir}/errors.json"):
    errors = json.load(open(f"{outdir}/errors.json"))

# Testdata-staleness guard (round-9 lesson: the driver regenerated
# /root/testdata between Verify and the artifact being read, and the
# stale pass went unnoticed). Verify records each table's
# (len, mtime_ms); if the files on disk have changed since, every
# comparison below is against DIFFERENT data than Spark read.
fingerprint_stale = False
if os.path.exists(f"{outdir}/fingerprint.json"):
    fp = json.load(open(f"{outdir}/fingerprint.json"))
    for t, rec in sorted(fp.items()):
        f = f"{sfdir}/{t}.parquet"
        if not os.path.exists(f):
            print(f"WARN fingerprint: {t}.parquet missing from {sfdir}")
            fingerprint_stale = True
            continue
        st = os.stat(f)
        if st.st_size != rec["len"] or int(st.st_mtime * 1000) != rec["mtime_ms"]:
            print(f"WARN fingerprint: {t}.parquet changed since Verify ran "
                  f"(len {rec['len']}→{st.st_size}, mtime_ms {rec['mtime_ms']}→{int(st.st_mtime*1000)})"
                  " — results below compare stale Spark output against current data")
            fingerprint_stale = True

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return repr(v)
    return repr(v)

fails = 0
checked = 0
def fail(name, msg, check="oracle"):
    global fails
    print(f"FAIL {name}: {msg}")
    results[name] = {"check": check, "status": "fail", "detail": msg[:200]}
    fails += 1

for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    checked += 1
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        fail(name, f"query failed in Verify: {errors[name]}" if name in errors
             else "no spark output"); continue
    try:
        duck = con.sql(sql)
        dtypes = dict(zip(duck.columns, (str(t) for t in duck.types)))
        dcols = sorted(duck.columns)
        drows = con.sql(f"SELECT {','.join(dcols)} FROM ({sql})").fetchall()
        spark = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet' LIMIT 0")
        stypes = dict(zip(spark.columns, (str(t) for t in spark.types)))
        scols = sorted(spark.columns)
        srows = con.sql(f"SELECT {','.join(scols)} FROM '{outdir}/{name}/*.parquet'").fetchall()
    except Exception as e:
        fail(name, str(e)); continue
    if dcols != scols:
        fail(name, f"cols duck={dcols} spark={scols}"); continue
    # The driver hash-compares TYPED values — repr() below erases type
    # skew (e.g. DuckDB sum(int)=HUGEINT vs Spark BIGINT), which is how
    # a mismatch shipped in round 1. Compare declared types too.
    # Integer widths <= 64 bits are equivalent under the driver's
    # normalization (round-1 rows with INTEGER-vs-BIGINT row_number
    # hash-matched); HUGEINT (int128) is NOT and must be flagged.
    INT64 = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
    def tnorm(t):
        return "INT64" if t in INT64 else t
    tdiff = [(c, dtypes[c], stypes[c]) for c in dcols
             if tnorm(dtypes[c]) != tnorm(stypes[c])]
    if tdiff:
        fail(name, f"type skew (col, duck, spark): {tdiff}"); continue
    dn = sorted(tuple(norm(v) for v in r) for r in drows)
    sn = sorted(tuple(norm(v) for v in r) for r in srows)
    if len(dn) != len(sn):
        fail(name, f"rows duck={len(dn)} spark={len(sn)}"); continue
    if dn != sn:
        diff = [(a, b) for a, b in zip(dn, sn) if a != b][:3]
        fail(name, f"value mismatch, first diffs: {diff}"); continue
    print(f"PASS {name} ({len(dn)} rows)")
    results[name] = {"check": "oracle", "status": "pass", "rows": len(sn)}

# Rows-only queries (no oracle SQL): record the driver's rows>0 check.
# Restricted to the CURRENT query set (queries.json, written by
# Verify): a stale outdir subdirectory from a renamed/removed query
# must not count as a pass. Fall back to the directory glob (with a
# warning) for outdirs produced by an older Verify.
qnames_path = f"{outdir}/queries.json"
if os.path.exists(qnames_path):
    known = set(json.load(open(qnames_path)))
else:
    print("WARN: no queries.json in outdir — rows-only pass may count stale dirs")
    known = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{outdir}/*/")}
for name in sorted(known):
    if name in oracle or (only and name not in only): continue
    checked += 1
    try:
        n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
    except Exception as e:
        fail(name, f"query failed in Verify: {errors[name]}" if name in errors
             else f"rows-only read: {e}", check="rows_only"); continue
    status = "pass" if n > 0 else "fail"
    if n == 0: fails += 1
    print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only, {n} rows)")
    results[name] = {"check": "rows_only", "status": status, "rows": n}

if json_out:
    with open(json_out, "w") as f:
        fp_rec = (json.load(open(f"{outdir}/fingerprint.json"))
                  if os.path.exists(f"{outdir}/fingerprint.json") else None)
        json.dump({"sf_dir": sfdir, "queries": results,
                   "fingerprint": fp_rec, "fingerprint_stale": fingerprint_stale,
                   "n_pass": sum(1 for r in results.values() if r["status"] == "pass"),
                   "n_fail": fails}, f, indent=1, sort_keys=True)
print(f"\n{fails} failures / {checked} checked")
sys.exit(1 if fails else 0)
