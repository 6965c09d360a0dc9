"""Materialize a larger fixture tier by FK-consistent replication.

Usage::

    python tools/gen_sfx.py [--mult 10] [--src /root/testdata/sf0.1] \
                            [--out /tmp/sfgen/sf1]

Replicates every scaling table ``mult``-fold with shifted keys (offset
``copy * 10_000_000`` — far above every fixture max key), keeping
foreign keys consistent copy-by-copy (lineitem.l_orderkey follows
orders.o_orderkey, orders.o_custkey follows customer.c_custkey, ...).
Dimension tables (region, nation) stay fixed, like TPC-H does across
scale factors. Document text is perturbed with a per-copy suffix token
so the sf1 corpus is DISTINCT documents (near-dup density stays
proportional, not the degenerate all-replicas case — that adversarial
case is measured separately in SCALING.md's 10x probe). Embedding
component 0 gets a tiny per-copy epsilon so vectors are unique.

Output: one directory per table named ``<table>.parquet`` containing
per-thread parquet files (so Spark's scan starts with >= cores splits
— the layout any real multi-file table has; a single 100 MB file would
serialize the scan on one split and measure IO, not the engine).

This writes OUTSIDE the repo (default /tmp) — generated tiers are
measurement inputs, not source.
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

OFFSET = 10_000_000

# table -> list of key columns to shift per copy
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def gen(src: str, out: str, mult: int, *, distinct_docs: bool = False) -> None:
    con = duckdb.connect()
    n_threads = min(16, os.cpu_count() or 8)
    con.execute(f"SET threads = {n_threads}")
    os.makedirs(out, exist_ok=True)

    for t in COPY_AS_IS:
        shutil.copy(os.path.join(src, f"{t}.parquet"), os.path.join(out, f"{t}.parquet"))
        print(f"{t}: copied (dimension)")

    for t, keys in SHIFT.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(mult):
            proj = []
            for c in cols:
                if c in keys:
                    proj.append(f"{c} + {i * OFFSET} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    if distinct_docs:
                        # PROPORTIONAL-density mode: append ~2x the
                        # doc's length of per-(doc, copy) pseudo-random
                        # hex (an md5 chain — repetition would collapse
                        # to ~6 distinct shingles and change nothing),
                        # pushing cross-copy Jaccard to ~0.2: copies are
                        # NOT near-dups of each other, so near-dup
                        # density per corpus row stays CONSTANT across
                        # tiers (the controlled pairs come from the
                        # entries' own _with_synthetic_neardups).  The
                        # default one-token 'copytag' suffix keeps
                        # copies mutually near-dup — dup-group size
                        # grows with mult (the ADVERSARIAL tier; at
                        # mult=100 pair output grows ~mult^2 and any
                        # pair-listing op is output-bound by design).
                        proj.append(
                            "text || ' ' || array_to_string("
                            "list_transform("
                            "range(1, greatest(length(text)//16, 4) + 1), "
                            f"j -> md5(text || '#{i}#' || j)), ' ') AS text"
                        )
                    else:
                        # distinct corpus per copy (see module docstring)
                        proj.append(f"text || ' copytag{i}' AS text")
                elif t == "embeddings" and c == "embedding" and i > 0:
                    proj.append(
                        f"(list_prepend((embedding[1] + {i}e-4)::FLOAT, "
                        "embedding[2:]))::FLOAT[] AS embedding"
                    )
                else:
                    proj.append(c)
            selects.append(
                f"SELECT {', '.join(proj)} FROM '{src}/{t}.parquet'"
            )
        union = " UNION ALL ".join(selects)
        dest = os.path.join(out, f"{t}.parquet")
        shutil.rmtree(dest, ignore_errors=True)
        con.execute(
            f"COPY ({union}) TO '{dest}' "
            f"(FORMAT PARQUET, PER_THREAD_OUTPUT, FILENAME_PATTERN 'part_{{i}}')"
        )
        n = con.execute(f"SELECT count(*) FROM '{dest}/*.parquet'").fetchone()[0]
        print(f"{t}: {n} rows -> {dest}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfgen/sf1")
    ap.add_argument("--distinct-docs", action="store_true",
                    help="per-(doc,copy) md5-chain text suffix: copies are "
                         "NOT near-dups of each other (proportional "
                         "near-dup density across tiers)")
    a = ap.parse_args()
    gen(a.src, a.out, a.mult, distinct_docs=a.distinct_docs)


if __name__ == "__main__":
    main()
