"""Local twin of the driver's DuckDB correctness harness.

For every registry entry: run the Spark query and the oracle SQL at the
given sf dir, compare row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted,
floats canonicalized via repr of round-trip).  Run this before every
commit that touches queries.py.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon_cell(v):
    import datetime
    import decimal
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        # Deliberately DISTINCT from int/float canon: the driver harness
        # canonicalizes DuckDB HUGEINT/DECIMAL (Arrow decimal128)
        # differently from Spark bigint, so an oracle emitting one must
        # fail here too (round-3 verdict: the old float-round coercion
        # masked exactly that divergence for kg_degree_stats /
        # dup_span_stats).
        return f"decimal:{v}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return repr(v)


def frame_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        tuple(canon_cell(r[i]) for i in order) for r in rows
    )
    import hashlib
    h = hashlib.sha256()
    for row in canon_rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from mdscraper_spark.queries import REGISTRY
    from mdscraper_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            failures.append((name, f"spark error: {exc}"))
            print(f"[FAIL] {name}: spark error: {exc}")
            continue
        if sql is None:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.sql(sql)
            ocols = [d[0] for d in res.description]
            # Fetch via Arrow (like the driver harness) so HUGEINT /
            # DECIMAL surface as decimal.Decimal instead of being
            # silently coerced to Python int by fetchall().
            orows = [tuple(d[c] for c in ocols)
                     for d in res.fetch_arrow_table().to_pylist()]
        except Exception as exc:
            failures.append((name, f"duckdb error: {exc}"))
            print(f"[FAIL] {name}: duckdb error: {exc}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sd = frame_digest(scols, [[r[c] for c in scols] for r in srows])
            od = frame_digest(ocols, orows)
            if sd != od:
                problems.append("value-hash mismatch")
                # show a diff sample
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ss = sorted(tuple(canon_cell(r[scols[i]]) for i in order_s)
                            for r in srows)
                oo = sorted(tuple(canon_cell(r[i]) for i in order_o)
                            for r in orows)
                for a, b in zip(ss, oo):
                    if a != b:
                        problems.append(f"  spark={a}")
                        problems.append(f"  duck ={b}")
                        break
        if problems:
            failures.append((name, "; ".join(problems[:1])))
            print(f"[FAIL] {name}: " + "\n".join(problems))
        else:
            print(f"[ok] {name}: {len(srows)} rows")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[n for n, _ in failures]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
