#!/usr/bin/env python3
"""Synthesize an N-times-scaled copy of a testdata directory (events and
documents replicated with shifted ids/timestamps; other tables copied),
for the bench's second scale point — a constants-level check that the
shipped plans hold when the data grows, not just that the plan shapes
are right (PlanSpec covers shapes).

Usage: python3 tools/scale_testdata.py <srcDir> <dstDir> [factor=10]
"""
import sys, os, shutil
import duckdb

def main(src, dst, factor=10):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # events: N shifted copies; ts jittered by i microseconds so
    # (event_type, ts) stays unique, event_id offset keeps ids unique
    con.execute(f"""
        COPY (
          SELECT e.ts + to_microseconds(i.range) AS ts,
                 e.event_id + i.range * 10000000 AS event_id,
                 e.* EXCLUDE (ts, event_id)
          FROM '{src}/events.parquet' e CROSS JOIN range({factor}) i
        ) TO '{dst}/events.parquet' (FORMAT parquet)
    """)
    # documents: N copies under shifted doc_ids — every original doc
    # gains factor-1 exact twins, which stresses the dedup family far
    # harder than the row count alone (pair blowup is quadratic in the
    # copy count)
    con.execute(f"""
        COPY (
          SELECT d.doc_id + i.range * 100000000 AS doc_id,
                 d.* EXCLUDE (doc_id)
          FROM '{src}/documents.parquet' d CROSS JOIN range({factor}) i
        ) TO '{dst}/documents.parquet' (FORMAT parquet)
    """)
    # embeddings: N copies under shifted vec_ids — exact twins stress
    # the vector dedup family (twin groups are maximal-similarity
    # clusters) while the benchmark's query set (vec_id < 5) stays
    # pinned to the original five vectors
    con.execute(f"""
        COPY (
          SELECT e.vec_id + i.range * 1000000 AS vec_id,
                 e.* EXCLUDE (vec_id)
          FROM '{src}/embeddings.parquet' e CROSS JOIN range({factor}) i
        ) TO '{dst}/embeddings.parquet' (FORMAT parquet)
    """)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            shutil.copyfile(p, f"{dst}/{t}.parquet")
    n = con.execute(f"SELECT count(*) FROM '{dst}/events.parquet'").fetchone()[0]
    d = con.execute(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    print(f"wrote {dst}: events={n} documents={d} (factor {factor})")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
