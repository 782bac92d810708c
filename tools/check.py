#!/usr/bin/env python
"""Local emulation of the driver's correctness gate.

Usage: python tools/check.py <sfDir> <verifyOutDir> [--times]

--times appends per-query oracle wall seconds to each result line and
prints the slowest 15 + the total at the end — the in-repo visibility
for the DuckDB oracle bill (six oracles once cost 96% of 751 s at
sf0.01 and plausibly timed out the driver's gate; keep the total well
under ~5 min).

Reads each <verifyOutDir>/<name>/ parquet dump (written by graft.Verify),
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB
against views named after the parquet tables in <sfDir>, and compares:
column names (sorted), row count, and exact values of row-sets.

This is a builder-side self-check only — NOT part of the library.
"""
import sys, json, glob, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


class DriverUnsortable(Exception):
    """A cell type the DRIVER's comparison cannot handle.

    The driver sorts result frames with pandas ``sort_values``, which
    raises ``unhashable type`` on array/list/dict cells.  Round 7 hid
    three queries from the hard gate because this script stringified
    such cells and reported OK while the driver crashed — so mirror the
    driver: any non-scalar cell fails the local gate too.  Gate
    projections must serialize arrays to canonical strings
    (``array_join`` ↔ ``array_to_string``).
    """


def canon(rows, cols):
    """Sort columns by name, stringify values canonically, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, (list, tuple, dict, set)) or \
                    v.__class__.__name__ == "ndarray":
                raise DriverUnsortable(
                    f"column '{cols[i]}' holds {type(v).__name__} cells — "
                    "the driver's pandas sort crashes on these; emit a "
                    "canonical string (array_join / array_to_string)")
            if isinstance(v, float):
                vals.append(repr(v))
            elif isinstance(v, bytes):
                vals.append(v.hex())
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def _types_hash_equal(a, b):
    """True if the driver's hasher treats DuckDB types a and b alike.

    Integer widths below 64 bits hash identically (pyarrow upcasts on
    compare), but HUGEINT -> decimal128 and DECIMAL never match BIGINT.
    """
    if a is None or b is None:
        return False
    a, b = str(a).upper(), str(b).upper()
    if a == b:
        return True
    small = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"}
    return a in small and b in small


def main():
    args = [a for a in sys.argv[1:] if a != "--times"]
    times_mode = "--times" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    times = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    meta_path = f"{out_dir}/query_meta.json"
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}

    results = {}
    dump_dirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for d in dump_dirs:
        name = os.path.basename(d)
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = [c[0] for c in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            # surface per-query self-gate metadata (e.g. the ANN
            # variants' measured recall@5) so a rows-only entry carries
            # its machine-checkable gate value
            extra = "".join(
                f" {k}={v}" for k, v in sorted(meta.get(name, {}).items()))
            results[name] = f"ROWS_ONLY({len(got_rows)}){extra}"
            continue
        try:
            t0 = time.time()
            exp = con.execute(oracle[name])
            exp_cols = [c[0] for c in exp.description]
            exp_rows = exp.fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        # Type assertion: the driver's hasher distinguishes HUGEINT/DECIMAL
        # from BIGINT even when every value matches (round-1/2 failures).
        # canon() stringifies, erasing types — so compare DESCRIBE output.
        # A DESCRIBE failure must not silently pass the type assertion —
        # flag it on the result line so a weakened check is visible.
        type_check_skipped = None
        try:
            got_types = dict((r[0], r[1]) for r in con.execute(
                f"DESCRIBE SELECT * FROM '{d}/*.parquet'").fetchall())
            exp_types = dict((r[0], r[1]) for r in con.execute(
                "DESCRIBE " + oracle[name]).fetchall())
        except Exception as e:
            got_types, exp_types = {}, {}
            type_check_skipped = e
        type_diffs = [
            (c, got_types.get(c), exp_types.get(c))
            for c in sorted(set(got_types) | set(exp_types))
            if not _types_hash_equal(got_types.get(c), exp_types.get(c))]
        try:
            gc, gr = canon(got_rows, got_cols)
            ec, er = canon(exp_rows, exp_cols)
        except DriverUnsortable as e:
            results[name] = f"DRIVER_UNSORTABLE: {e}"
            continue
        if gc != ec:
            results[name] = f"COLS_MISMATCH spark={gc} duck={ec}"
        elif type_diffs:
            results[name] = f"TYPE_MISMATCH (col, spark, duck)={type_diffs}"
        elif len(gr) != len(er):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(gr)} duck={len(er)}"
        elif gr != er:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
        else:
            results[name] = f"OK({len(gr)})" + (
                f" TYPE_CHECK_SKIPPED({type_check_skipped})"
                if type_check_skipped else "")

    for n in sorted(oracle):
        if n not in results:
            results[n] = "MISSING_DUMP"
    width = max(len(n) for n in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for n in sorted(results):
        t = f"  [{times[n]:6.2f}s]" if times_mode and n in times else ""
        print(f"{n:<{width}}  {results[n]}{t}")
    if times_mode and times:
        top = sorted(times.items(), key=lambda kv: -kv[1])[:15]
        print(f"\noracle wall total: {sum(times.values()):.1f}s; slowest:")
        for n, t in top:
            print(f"  {t:7.2f}s  {n}")
    print(f"\n{n_ok}/{len(results)} passing")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
