#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each Spark result parquet under OUTDIR/<name>/, runs the matching
oracle SQL (OUTDIR/oracle_sql.json) in DuckDB with views over the fixture
parquet tables, and compares: column names (sorted), row count, and a hash
of the value matrix with columns sorted by name and rows sorted.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, json, glob, os, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # 17 significant digits = exact double round-trip. The library's
        # DECIMAL-term convention makes Spark/DuckDB doubles bit-identical,
        # so local PASS should predict an exact driver-side value hash.
        return f"{v:.17g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
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
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        gcols, grows = list(got.columns), got.fetchall()
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(grows)} rows)")
            n_skip += 1
            continue
        try:
            exp = con.sql(oracles[name])
            ecols, erows = list(exp.columns), exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
            continue
        gh, eh = table_hash(gcols, grows), table_hash(ecols, erows)
        if gh != eh:
            print(f"FAIL {name}: hash mismatch ({len(grows)} rows)")
            gorder = sorted(range(len(gcols)), key=lambda i: gcols[i])
            eorder = sorted(range(len(ecols)), key=lambda i: ecols[i])
            gm = sorted("\x01".join(canon(r[i]) for i in gorder) for r in grows)
            em = sorted("\x01".join(canon(r[i]) for i in eorder) for r in erows)
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
