"""End-to-end CDC-apply tests against a local warehouse.

Mirrors the reference's integration contract
(``SparkDestinationStreamIT.java:52-471``, FIXTURES.md §1-2): the 8-field
table, raw-JSON + struct payload inserts, stringified struct-key deletes
matching typed columns, update-replaces-exactly-one-row, injection safety,
and the batched apply the reference lacks.
"""

import datetime

import pytest
from pyspark.sql import types as T

from conduit_connector_s3_iceberg_spark.records import (
    KeyError_,
    Operation,
    Record,
)
from conduit_connector_s3_iceberg_spark.writer import CdcWriter, ParquetWarehouse

# FIXTURES.md §1: the reference IT table schema
SCHEMA = T.StructType(
    [
        T.StructField("string_field", T.StringType(), False),
        T.StructField("timestamp_tz_field", T.TimestampType(), False),
        T.StructField("list_field", T.ArrayType(T.StringType()), True),
        T.StructField("integer_field", T.IntegerType(), True),
        T.StructField("float_field", T.FloatType(), True),
        T.StructField("map_field", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("integer_in_float_field", T.FloatType(), True),
        T.StructField("missing_field", T.StringType(), True),
    ]
)

PAYLOAD = (
    b'{"string_field": "debug", "timestamp_tz_field": "2024-03-01T10:20:30.123456Z",'
    b' "integer_field": 123, "float_field": 456.78, "integer_in_float_field": 987.0,'
    b' "list_field": ["item_1", "item_2"], "map_field": {"foo": "bar"}}'
)


@pytest.fixture()
def writer(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "warehouse"))
    wh.create_table("t", SCHEMA)
    return CdcWriter(wh, "t")


def rows(writer):
    return writer.wh.read("t").orderBy("integer_field").collect()


def test_insert_raw_json(writer):
    writer.write(Record(b"p1", Operation.CREATE, payload_after=PAYLOAD))
    [r] = rows(writer)
    assert r.string_field == "debug"
    # micros precision round-trip (reference truncates to micros, IT :141)
    assert r.timestamp_tz_field == datetime.datetime(2024, 3, 1, 10, 20, 30, 123456)
    assert r.list_field == ["item_1", "item_2"]
    assert r.integer_field == 123
    assert r.float_field == pytest.approx(456.78)
    assert r.map_field == {"foo": "bar"}
    # integral-in-float JSON number lands in a float column
    assert r.integer_in_float_field == 987.0
    # never-sent field null-fills
    assert r.missing_field is None


def test_insert_struct_payload(writer):
    payload = {
        "string_field": "from_struct",
        "timestamp_tz_field": "2024-03-01T10:20:30.000001Z",
        "integer_field": 7.0,  # Struct numbers arrive as doubles
        "float_field": 1.5,
        "integer_in_float_field": 3.0,
        "list_field": ["a"],
        "map_field": {"k": "v"},
    }
    writer.write(Record(b"p1", Operation.SNAPSHOT, payload_after=payload))
    [r] = rows(writer)
    assert r.string_field == "from_struct"
    assert r.integer_field == 7  # integral normalization into int column


def test_delete_by_json_key(writer):
    writer.write(Record(b"1", Operation.CREATE, payload_after=PAYLOAD))
    writer.write(
        Record(
            b"2",
            Operation.CREATE,
            payload_after=PAYLOAD.replace(b"123", b"124").replace(b"debug", b"other"),
        )
    )
    n = writer.delete(Record(b"3", Operation.DELETE, key=b'{"integer_field": 123}'))
    assert n == 1
    [r] = rows(writer)
    assert r.integer_field == 124


def test_delete_by_stringified_struct_key_matches_int_column(writer):
    # reference IT :166-183 — struct key {integer_field: 12} → '12' predicate
    writer.write(Record(b"1", Operation.CREATE, payload_after=PAYLOAD))
    n = writer.delete(Record(b"2", Operation.DELETE, key={"integer_field": 123.0}))
    assert n == 1
    assert rows(writer) == []


def test_delete_error_taxonomy(writer):
    # FIXTURES.md §2 table
    for bad_key, msg in [
        (b"abc123", "input data is not JSON"),
        (b"", "input data is not JSON"),
        (b"{}", "key has no fields"),
        ({}, "key has no fields"),
        (b'{"integer_field": null}', "key has no fields"),
    ]:
        with pytest.raises((KeyError_, ValueError), match=msg):
            writer.delete(Record(b"x", Operation.DELETE, key=bad_key))


def test_composite_key_ands_all_fields(writer):
    # divergence from the reference's :126-132 bug — we AND every key field
    writer.write(Record(b"1", Operation.CREATE, payload_after=PAYLOAD))
    other = PAYLOAD.replace(b"124", b"123").replace(b'"debug"', b'"other"')
    writer.write(Record(b"2", Operation.CREATE, payload_after=other))
    n = writer.delete(
        Record(
            b"3",
            Operation.DELETE,
            key=b'{"integer_field": 123, "string_field": "debug"}',
        )
    )
    assert n == 1  # only the (123, debug) row; the (123, other) row survives
    [r] = rows(writer)
    assert r.string_field == "other"


def test_sql_injection_safe(writer):
    # reference IT :309-325 — hostile key value must not over-delete
    writer.write(Record(b"1", Operation.CREATE, payload_after=PAYLOAD))
    n = writer.delete(
        Record(b"2", Operation.DELETE, key=b'{"string_field": "105 OR 1=1"}')
    )
    assert n == 0
    assert len(rows(writer)) == 1


def test_update_replaces_exactly_matching_row(writer):
    # reference IT :279-307
    writer.write(Record(b"1", Operation.CREATE, payload_after=PAYLOAD))
    writer.write(
        Record(
            b"2",
            Operation.CREATE,
            payload_after=PAYLOAD.replace(b"123", b"124"),
        )
    )
    updated = PAYLOAD.replace(b'"debug"', b'"updated"')
    writer.write(
        Record(
            b"3",
            Operation.UPDATE,
            key=b'{"integer_field": 123}',
            payload_after=updated,
        )
    )
    got = rows(writer)
    assert len(got) == 2
    assert got[0].integer_field == 123 and got[0].string_field == "updated"
    assert got[1].integer_field == 124 and got[1].string_field == "debug"


def test_unspecified_is_silent_noop(writer):
    writer.write(Record(b"1", Operation.UNSPECIFIED))
    assert rows(writer) == []


def test_failfast_on_nonconforming_payload(writer):
    # a record that cannot coerce into the table schema errors the record
    bad = b'{"string_field": "x", "timestamp_tz_field": "2024-01-01T00:00:00Z", "integer_field": "not_an_int"}'
    with pytest.raises(Exception):
        writer.write(Record(b"1", Operation.CREATE, payload_after=bad))


def test_apply_batch_lww_and_deletes(writer):
    recs = [
        Record(b"1", Operation.CREATE, payload_after=PAYLOAD),  # ins 123
        Record(
            b"2", Operation.CREATE, payload_after=PAYLOAD.replace(b"123", b"124")
        ),  # ins 124
        Record(
            b"3",
            Operation.UPDATE,
            key=b'{"integer_field": 123}',
            payload_after=PAYLOAD.replace(b'"debug"', b'"v2"'),
        ),  # upd 123
        Record(b"4", Operation.DELETE, key=b'{"integer_field": 124}'),  # del 124
        Record(
            b"5", Operation.CREATE, payload_after=PAYLOAD.replace(b"123", b"125")
        ),  # ins 125
    ]
    writer.apply_batch(recs, key_fields=["integer_field"])
    got = rows(writer)
    assert [r.integer_field for r in got] == [123, 125]
    assert got[0].string_field == "v2"  # last write for key 123 won


def test_cdc_delete_via_mor_files(spark, tmp_path):
    """mor_deletes=True routes CDC deletes through equality-delete files:
    reads hide the row immediately, data files are untouched until
    rewrite_deletes, and the stringified-struct-key cast still applies."""
    from conduit_connector_s3_iceberg_spark.writer import (
        CdcWriter,
        ParquetWarehouse,
    )

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("items", SCHEMA)
    writer = CdcWriter(wh, "items", mor_deletes=True)
    writer.insert(Record(b"1", Operation.CREATE, payload_after=PAYLOAD))
    writer.insert(
        Record(
            b"2",
            Operation.CREATE,
            payload_after=PAYLOAD.replace(b"123", b"124").replace(
                b"debug", b"other"
            ),
        )
    )
    files_before = wh.num_data_files("items")

    n = writer.delete(
        Record(b"3", Operation.DELETE, key=b'{"integer_field": 123}')
    )
    assert n == 1
    assert wh.num_data_files("items") == files_before  # no rewrite
    left = [r["integer_field"] for r in wh.read("items").collect()]
    assert 123 not in left and len(left) == 1
    wh.rewrite_deletes("items")
    assert [r["integer_field"] for r in wh.read("items").collect()] == left
