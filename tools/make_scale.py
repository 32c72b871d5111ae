"""Deterministic scale-ladder generator: replicate sf0.1 to sfN.

The r8 verdict's top next-round item: every 100-TB claim rests on plan-
shape arguments that have never seen data above sf0.1 (17 MB). This
synthesizes sf1 (~10x, ~170 MB) — or any multiple — by replicating the
driver's sf0.1 tables with id offsets, so the heavy operators can be
benched at two scales and their scaling exponents measured
(tools/bench_scale.py).

Replication semantics (replica k of R, offset = k * 10^9):

* fact/dim keys (custkey, orderkey, partkey, suppkey, event_id, user_id,
  doc_id, vec_id) are offset per replica — joins stay consistent WITHIN a
  replica, which preserves join fan-outs exactly;
* nation/region are fixed dimensions (25/5 rows) — copied once, and the
  small nationkey/regionkey references stay valid across replicas (same
  as TPC-H: nation does not scale with sf);
* documents.text: replica 0 is verbatim; replica k>0 suffixes every
  whitespace token with `~rk`, so intra-replica shingle structure (and
  thus near-dup cluster shape) is preserved exactly while NO shingle is
  shared across replicas — the dedup workload scales linearly in
  clusters, not quadratically in cross-replica pairs (replicating text
  verbatim would make every doc a 10-way near-dup clique and change the
  workload's shape, not just its size);
* embeddings are copied verbatim per replica (vec_id offset): ANN cell
  populations scale linearly, which is the property the probe-cost
  scaling argument needs.

Output: <out>/sf<N>/<table>.parquet (single file per table, written by
DuckDB). Deterministic — re-running produces byte-stable content (no
randomness; ordering fixed by explicit ORDER BY).

Usage: python tools/make_scale.py [R] [out_dir]
       (default R=10 -> sf1 at /root/repo/scale-ladder/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFFSET = 10**9

# per-table key columns to offset (column -> True); everything else copies
PLAN = {
    "region": None,  # fixed dimension: copy once
    "nation": None,  # fixed dimension: copy once
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}


def replica_select(table: str, cols: list[tuple[str, str]], k: int) -> str:
    keys = PLAN[table] or []
    parts = []
    for name, _typ in cols:
        if name in keys:
            parts.append(f"({name} + {k * OFFSET}) AS {name}")
        elif table == "documents" and name == "text" and k > 0:
            parts.append(
                "array_to_string(list_transform(string_split(text, ' '), "
                f"t -> t || '~r{k}'), ' ') AS text"
            )
        elif table == "documents" and name == "n_chars" and k > 0:
            # keep the column consistent with the rewritten text
            parts.append(
                "CAST(length(array_to_string(list_transform("
                f"string_split(text, ' '), t -> t || '~r{k}'), ' ')) "
                "AS BIGINT) AS n_chars"
            )
        else:
            parts.append(name)
    return f"SELECT {', '.join(parts)} FROM src"


def main() -> int:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "scale-ladder", f"sf{r // 10}")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table in PLAN:
        dst = os.path.join(out, f"{table}.parquet")
        if os.path.exists(dst):
            print(f"skip {table} (exists)")
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM '{SRC}/{table}.parquet'"
        )
        cols = [
            (row[0], row[1])
            for row in con.execute("DESCRIBE SELECT * FROM src").fetchall()
        ]
        if PLAN[table] is None:
            con.execute(
                f"COPY (SELECT * FROM src) TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            union = "\nUNION ALL\n".join(
                replica_select(table, cols, k) for k in range(r)
            )
            order = PLAN[table][0]
            con.execute(
                f"COPY (SELECT * FROM ({union}) ORDER BY {order}) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"wrote {table}: {n} rows -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
