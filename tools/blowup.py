#!/usr/bin/env python3
"""10x fixture blow-up for the scale soak (graft.Soak).

Replicates the driver-generated sf parquet tables K times with
id-shifted replicas, so the heavy pipelines can be soaked at ~10x the
largest generated SF without touching /root/testdata. Text/vectors are
kept byte-identical across replicas: near-dup stages then see clusters
of K copies (a deliberately adversarial duplication rate for the
candidate joins), and id parity/threshold structure is preserved by
shifting with an EVEN multiple well above every live id.

Documents get a per-replica token INSERTED INTO EVERY LINE (before each
' table ' separator and at the end): byte-identical replicated lines
would otherwise make the corpus-level boilerplate strip delete EVERY
line of EVERY doc (each line now appears in K docs), collapsing all
cleaned texts to '' — whose single shared shingle turns the near-dup
candidate join into an all-pairs product (~1e9 pairs at K=10 on sf0.1;
measured as a hang). With per-replica line markers the strip behaves
like the base fixture and duplication stress stays in the id space.

Usage: tools/blowup.py <srcDir> <dstDir> [K]
"""
import sys

import duckdb

SHIFT = 1_000_000_000  # even, far above any generated id

# table -> columns to shift by replica * SHIFT
SHIFTS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
}

# per-table extra projection rewrites keyed by column
REWRITES = {
    ("documents", "text"): (
        "replace(text, ' table ', ' rep' || r.k || ' table ')"
        " || ' rep' || r.k AS text"
    ),
}


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        proj = ", ".join(
            f"{c} + r.k * {SHIFT} AS {c}"
            if c in keys
            else REWRITES.get((table, c), c)
            for c in cols
        )
        con.execute(
            f"""COPY (
              SELECT {proj}
              FROM '{src}/{table}.parquet',
                   (SELECT unnest(range({k})) AS k) r
            ) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"""
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    # small dims copied verbatim
    for table in ["region", "nation", "customer", "supplier", "part"]:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{table}.parquet') "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )


if __name__ == "__main__":
    main()
