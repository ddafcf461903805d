#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"`,
run `python3 scripts/check_correctness.py [sfDir] [outDir]`.

For each query: loads the Spark-written parquet, runs the oracle SQL in
DuckDB over the same source tables, sorts columns by name (driver
semantics), and compares values row by row.

This is a build-time validation tool only (python/duckdb are driver-side);
the engine itself is pure Scala/Spark.
"""
import duckdb, glob, json, math, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

# a partial file only exists when the latest Verify run was a
# SPARK_GRAFT_VERIFY_ONLY subset (full runs delete it) — check that subset
import os
_partial = f"{out}/oracle_sql.partial.json"
oracle = json.load(open(_partial if os.path.exists(_partial)
                        else f"{out}/oracle_sql.json"))
fails = []


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"[MISS]   {name}: no spark output")
        fails.append(name)
        continue
    got = con.execute(f"SELECT * FROM read_parquet('{files[0]}')").fetchall()
    gcols = [d[0] for d in con.description]
    try:
        exp = con.execute(sql).fetchall()
        ecols = [d[0] for d in con.description]
    except Exception as ex:
        print(f"[ORACLE] {name}: {ex}")
        fails.append(name)
        continue
    if sorted(gcols) != sorted(ecols):
        print(f"[SCHEMA] {name}: spark={sorted(gcols)} oracle={sorted(ecols)}")
        fails.append(name)
        continue
    # Column-TYPE guard: the driver's hash is type-sensitive where this
    # checker's value normalization is not (e.g. DuckDB sum(INTEGER) ->
    # HUGEINT vs Spark BIGINT hashed differently despite equal values).
    # Compare DuckDB-vocabulary types on both sides via DESCRIBE.
    gtypes = dict(con.execute(
        f"SELECT column_name, column_type FROM "
        f"(DESCRIBE SELECT * FROM read_parquet('{files[0]}'))").fetchall())
    etypes = dict(con.execute(
        f"SELECT column_name, column_type FROM (DESCRIBE {sql})").fetchall())
    tdrift = {c: (gtypes[c], etypes[c]) for c in gtypes
              if gtypes[c] != etypes[c]}
    if tdrift:
        print(f"[TYPE]   {name}: spark-vs-oracle column type drift: {tdrift}")
        fails.append(name)
        continue
    # FLAT-column guard: the driver's pandas comparator raises
    # "unhashable type: numpy.ndarray" on any array/struct/map output
    # column (r8's q_inverted_index). This checker normalizes lists so
    # values would compare fine — flag the shape itself instead.
    nested = {c: t for c, t in gtypes.items()
              if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))}
    if nested:
        print(f"[NESTED] {name}: non-flat output columns (driver "
              f"comparator cannot hash these): {nested}")
        fails.append(name)
        continue
    gi = sorted(range(len(gcols)), key=lambda i: gcols[i])
    ei = sorted(range(len(ecols)), key=lambda i: ecols[i])
    g = [tuple(norm(r[i]) for i in gi) for r in got]
    e = [tuple(norm(r[i]) for i in ei) for r in exp]
    if g != e:
        msg = f"[DIFF]   {name}: {len(g)} spark rows vs {len(e)} oracle rows"
        print(msg)
        for i, (a, b) in enumerate(zip(g, e)):
            if a != b:
                print(f"         row {i} cols {sorted(gcols)}:")
                print(f"         spark : {a}")
                print(f"         oracle: {b}")
                break
        fails.append(name)
    else:
        print(f"[OK]     {name} ({len(g)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
if fails:
    print("FAILED: " + " ".join(fails))
sys.exit(1 if fails else 0)
