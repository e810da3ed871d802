#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each Spark result parquet under OUTDIR/<name>/, runs the matching
oracle SQL (OUTDIR/oracle_sql.json) in DuckDB with views over the fixture
parquet tables, and compares: column names (sorted), row count, and a hash
of the value matrix with columns sorted by name and rows sorted.

Both sides are materialized through pandas (`.df()`), NOT `fetchall()`:
the driver's comparator is pandas-based, so local results must inherit
pandas dtype coercions to predict it — DuckDB HUGEINT (integer sum())
becomes float64 ("99111.0" vs int64 "99111"), and list-typed cells are
unhashable in pandas sort_values. Round 2 shipped 5 queries that passed
a fetchall()-based version of this script and failed the driver for
exactly those two reasons.

A result-type lint additionally rejects oracle outputs whose declared
DuckDB type is HUGEINT or any nested type (LIST/STRUCT/MAP/ARRAY) before
comparison, so the failure mode is named instead of a hash mismatch.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, json, glob, os, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Declared oracle column types outside this set get a lint warning; the
# BANNED subset (pandas-hostile) is a hard FAIL.
ALLOWED_TYPES = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                 "FLOAT", "VARCHAR", "TIMESTAMP", "DATE", "BOOLEAN",
                 "DECIMAL")
BANNED_MARKERS = ("HUGEINT", "[]", "LIST", "STRUCT", "MAP", "ARRAY")


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):  # includes numpy.float64 (a float subclass)
        if v != v:
            return "\x00NULL"  # pandas renders SQL NULL as NaN; fold both
        return f"{v:.17g}"
    return str(v)


def lint_types(name, rel):
    """Return a list of lint errors for pandas-hostile oracle types."""
    errs = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(m in t for m in BANNED_MARKERS):
            errs.append(f"{col}: {t} (cast to ::BIGINT / serialize to "
                        f"VARCHAR — pandas mangles this type)")
        elif not any(t.startswith(a) for a in ALLOWED_TYPES):
            print(f"   lint-warn {name}.{col}: unusual oracle type {t}")
    return errs


def frame_rows(rel):
    """Materialize a DuckDB relation the way the driver does: via pandas.

    sort_values over every column reproduces the driver's row sort —
    including its TypeError on unhashable (ndarray) cells.
    """
    df = rel.df()
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return list(df.columns), df.values.tolist()


def table_hash(rows):
    mat = sorted("\x01".join(canon(v) for v in r) for r in rows)
    h = hashlib.sha256()
    for line in mat:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_skip = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        if name not in oracles:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            print(f"SKIP {name}: no oracle ({len(got.fetchall())} rows)")
            n_skip += 1
            continue
        try:
            exp = con.sql(oracles[name])
            type_errs = lint_types(name, exp)
            if type_errs:
                print(f"FAIL {name}: oracle result-type lint:")
                for e in type_errs:
                    print(f"   {e}")
                n_fail += 1
                continue
            ecols, erows = frame_rows(exp)
        except Exception as e:
            print(f"FAIL {name}: oracle err: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            gcols, grows = frame_rows(got)
        except Exception as e:
            print(f"FAIL {name}: spark-side err: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
            continue
        gh, eh = table_hash(grows), table_hash(erows)
        if gh != eh:
            print(f"FAIL {name}: hash mismatch ({len(grows)} rows)")
            gm = sorted("\x01".join(canon(v) for v in r) for r in grows)
            em = sorted("\x01".join(canon(v) for v in r) for r in erows)
            shown = 0
            for a, b in zip(gm, em):
                if a != b and shown < 3:
                    print(f"   spark:  {a[:200]!r}")
                    print(f"   oracle: {b[:200]!r}")
                    shown += 1
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
