"""Local stand-in for the driver's duckdb-oracle correctness harness.

Runs every registered query's Spark build and DuckDB oracle side by side,
compares row count, column names, and order-insensitive values (exact for
non-floats; exact-after-round for floats since the suite is engineered to be
cross-engine deterministic). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pyarrow.types as pat  # noqa: E402

from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402
from conduit_connector_s3_iceberg_spark.sources.tables import TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # bit-exact: the suite is engineered for determinism
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = build_session(shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_weak = 0
    report: dict[str, dict] = {}

    def record(name, *, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }

    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.build(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            record(name, err=f"spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"weak  {name}: rows={len(srows)} ({time.time()-t0:.1f}s, no oracle)")
            record(name, spark_rows=len(srows), err="no oracle (rows-only)")
            n_weak += 1
            continue
        try:
            otypes = {
                f.name: f.type for f in con.execute(q.oracle).arrow().schema
            }
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            record(name, spark_rows=len(srows), err=f"duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        # Arrow-type guard: DuckDB returns SUM(integer) as HUGEINT (Arrow
        # decimal128), which the driver's value-hash treats as != Spark's
        # BIGINT even when values are equal. Python-level compares below are
        # type-blind (both surface as int), so catch the mismatch here.
        sdtypes = dict(sdf.dtypes)
        for cname, atype in otypes.items():
            if pat.is_decimal(atype) and not sdtypes.get(cname, "").startswith(
                "decimal"
            ):
                problems.append(
                    f"oracle col {cname} is Arrow {atype} but spark is "
                    f"{sdtypes.get(cname)} — wrap the oracle in "
                    "CAST(... AS BIGINT/DOUBLE) (driver hash would fail)"
                )
        # Array/map-output guard: the driver canonicalizes via pandas
        # sort_values, which throws `unhashable type: 'list'` on list cells
        # (r02: emb_quantize_int8 crash). This harness tuple-izes lists
        # (norm_cell) and would silently pass — so reject the schema shape
        # outright: top-level outputs must be scalar (serialize arrays with
        # array_join/to_json on BOTH engine and oracle sides).
        for cname, ctype in sdf.dtypes:
            if ctype.startswith(("array", "map", "struct")):
                problems.append(
                    f"spark col {cname} is {ctype} — driver hash crashes on "
                    "non-scalar cells; serialize to string on both sides"
                )
        for cname, atype in otypes.items():
            if pat.is_list(atype) or pat.is_map(atype) or pat.is_struct(atype):
                problems.append(
                    f"oracle col {cname} is Arrow {atype} — driver hash "
                    "crashes on non-scalar cells; serialize to string"
                )
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sn, on_ = norm_rows(scols, srows), norm_rows(ocols, orows)
            if sn != on_:
                bad = sum(1 for a, b in zip(sn, on_) if a != b)
                problems.append(f"values differ in {bad}/{len(sn)} rows")
                for a, b in list(zip(sn, on_))[:200]:
                    if a != b:
                        problems.append(f"  spark={a}")
                        problems.append(f"  orcl ={b}")
                        break
        ok = not problems
        record(
            name,
            rows_match=len(srows) == len(orows),
            schema_match=sorted(scols) == sorted(ocols),
            hash_match=ok,
            spark_rows=len(srows),
            oracle_rows=len(orows),
            err="; ".join(problems) if problems else None,
        )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    out = os.environ.get("CORRECTNESS_JSON_OUT")
    if out:
        # same per-query shape as the driver's CORRECTNESS_r{N}.json, so the
        # queries outside the driver's 50-name window carry a
        # machine-readable verdict every round (r3 verdict #4)
        with open(out, "w") as fh:
            json.dump(report, fh, indent=2, sort_keys=True)
        print(f"wrote {out} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
