"""Column-expression CDC codec — the scale path of :mod:`..records`.

``records.py`` decodes one record at a time on the driver (the reference's
model: ``SparkDestinationStream.java:138-262``). At 100 TB the decode must
run on executors as column expressions over a DataFrame of raw envelope
rows; this module is that form. Both implement the same observable rules:

* payload JSON is parsed against the target table schema, FAILFAST
  (``SparkDestinationStream.java:221-227``);
* top-level exact-integral floats coerce into int columns
  (``:237-262``) — expressed here by parsing numerics wide (double) and
  casting back, which Catalyst folds into the JSON scan;
* keys are JSON objects of scalars; values compare via implicit casts
  (``:195-206``).

Everything stays JVM-side — no Python UDFs; ``from_json`` / ``cast`` are
whole-stage-codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Envelope schema for a CDC record stream (mirrors ``opencdc.proto:51-74``
#: — position/operation/key/before/after/metadata; key+payloads carried as
#: raw JSON text exactly as the proto's raw-``Data`` form).
CDC_ENVELOPE = T.StructType(
    [
        T.StructField("position", T.StringType(), False),
        T.StructField("operation", T.StringType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("before", T.StringType(), True),
        T.StructField("after", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_INTEGRALS = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _widened(schema: T.StructType) -> T.StructType:
    """Top-level integral fields widened to double for the first parse —
    the columnar twin of the reference's integral rewrite (``:253-259``:
    top-level only, nested values untouched)."""
    return T.StructType(
        [
            T.StructField(f.name, T.DoubleType(), f.nullable)
            if isinstance(f.dataType, _INTEGRALS)
            else f
            for f in schema.fields
        ]
    )


def conform_payload(json_col: Column | str, schema: T.StructType) -> Column:
    """Parse a payload-JSON column against the target table schema →
    struct column with the table's exact field types.

    Integral columns parse wide (so ``987.0`` is accepted, reference
    ``:244-262``) then cast back to the declared type. FAILFAST: malformed
    JSON raises through the job, same record-rejection contract as the
    reference's insert path.
    """
    parsed = F.from_json(json_col, _widened(schema), {"mode": "FAILFAST"})
    return F.struct(
        *[
            parsed[f.name].cast(f.dataType).alias(f.name)
            if isinstance(f.dataType, _INTEGRALS)
            else parsed[f.name].alias(f.name)
            for f in schema.fields
        ]
    )


def key_struct(key_col: Column | str, key_fields: list[str]) -> Column:
    """Key-JSON column → struct of (string-typed) key fields; values match
    typed columns through implicit casts — the columnar form of the
    reference's stringified struct keys (``:195-206``)."""
    kmap = F.from_json(key_col, T.MapType(T.StringType(), T.StringType()))
    return F.struct(*[kmap[k].alias(k) for k in key_fields])
