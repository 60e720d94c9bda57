"""Self-check mimicking the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() twin on DuckDB
at the given sf dir, compare row count + order-insensitive value hash
(columns sorted by name, floats rounded).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from ocr_spark.session import get_spark

    spark = get_spark("oracle_check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = E.queries(), E.oracle_sql(sf_dir)
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in os_:
            print(f"{name:24s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        cur = con.execute(os_[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        sh = value_hash([[r[c] for c in scols] for r in srows], scols)
        dh = value_hash(drows, dcols)
        ok = len(srows) == len(drows) and sh == dh
        status = "OK " if ok else "FAIL"
        print(
            f"{name:24s} {status} spark_rows={len(srows):7d} duck_rows={len(drows):7d} "
            f"hash_match={sh == dh}"
        )
        if not ok:
            failed.append(name)
            sset = sorted("|".join(_norm_cell(r[c]) for c in sorted(scols)) for r in srows)
            dmap = dict(zip(dcols, range(len(dcols))))
            dset = sorted(
                "|".join(_norm_cell(row[dmap[c]]) for c in sorted(dcols)) for row in drows
            )
            for a, b in list(zip(sset, dset))[:2000]:
                if a != b:
                    print("  spark:", a[:160])
                    print("  duck :", b[:160])
                    break
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
