"""Skewed (Zipf-head) scale-ladder generator: replicate sf0.1 to sfN with
HOT keys, where make_scale.py deliberately keeps every distribution uniform.

r9 verdict, next-round item 3: the uniform ladder preserves sf0.1's key
distributions, so the band-join dedup family and the graph shuffles have
never seen a hot key at scale. Real 100-TB corpora are Zipfian: boilerplate
pages duplicate thousands of times, one crawl source dominates, one
high-volume counterparty touches a third of the fact table. This variant
plants exactly those heads:

* documents — 3% of base docs (doc_id % 100 < 3) become ONE corpus-wide
  boilerplate page: constant text, identical in every replica (the classic
  giant-duplicate-group / hot-shingle case: at R=10 that is a single
  multi-thousand-member band bucket). A further 27% (3 <= doc_id % 100 < 30)
  replicate VERBATIM across replicas (10-way duplicate groups — the Zipf
  torso), where the uniform ladder suffixes every token per replica to keep
  replicas shingle-disjoint. Both hot classes get source='hot' (~30% of the
  corpus from one source). The remaining 70% keep the uniform `~rk`
  suffixing.
* lineitem — 30% of lines (l_orderkey % 10 < 3) are redirected to ONE
  global hot supplier (l_suppkey = 1, never offset): the customer-supplier
  graph gains a hub touching ~30% of customers, so label-propagation /
  link-prediction shuffles see a true hot node.
* everything else replicates exactly as the uniform ladder.

Boilerplate tokens are a private vocabulary (`boilertok<i>`), so the giant
group links to nothing else in the corpus — the head is hot but the
workload's OUTPUT stays well-defined (one group), which is what lets the
alpha comparison isolate shuffle-skew cost from output growth.

Output: <out>/<table>.parquet (default scale-ladder/sf1-skew). Deterministic.

Usage: python tools/make_scale_skew.py [R] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFFSET = 10**9

BOILER = " ".join(f"boilertok{i}" for i in range(40))

PLAN = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}


def _doc_text(k: int) -> str:
    """Per-replica text expression implementing the 3/27/70 split."""
    suffixed = (
        "array_to_string(list_transform(string_split(text, ' '), "
        f"t -> t || '~r{k}'), ' ')"
    )
    cold = "text" if k == 0 else suffixed
    return (
        f"CASE WHEN doc_id % 100 < 3 THEN '{BOILER}' "
        f"WHEN doc_id % 100 < 30 THEN text "
        f"ELSE {cold} END"
    )


def replica_select(table: str, cols: list[tuple[str, str]], k: int) -> str:
    keys = PLAN[table] or []
    parts = []
    for name, _typ in cols:
        if table == "lineitem" and name == "l_suppkey":
            # 30% of lines -> the single global hot supplier (never offset)
            parts.append(
                f"CASE WHEN l_orderkey % 10 < 3 THEN 1 "
                f"ELSE l_suppkey + {k * OFFSET} END AS l_suppkey"
            )
        elif name in keys:
            parts.append(f"({name} + {k * OFFSET}) AS {name}")
        elif table == "documents" and name == "text":
            parts.append(f"{_doc_text(k)} AS text")
        elif table == "documents" and name == "source":
            parts.append(
                "CASE WHEN doc_id % 100 < 30 THEN 'hot' ELSE source END "
                "AS source"
            )
        elif table == "documents" and name == "n_chars":
            parts.append(
                f"CAST(length({_doc_text(k)}) AS BIGINT) AS n_chars"
            )
        else:
            parts.append(name)
    return f"SELECT {', '.join(parts)} FROM src"


def main() -> int:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scale-ladder",
            f"sf{r // 10}-skew",
        )
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
