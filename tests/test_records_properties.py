"""Property-based tests (hypothesis) for the record decode layer — the
reference's behavior rules hold for ALL inputs, not just the handwritten
cases in test_records.py."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conduit_connector_s3_iceberg_spark.records import (
    KeyError_,
    json_key_to_map,
    normalize_payload_json,
    struct_key_to_map,
)

scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
)
field_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
    min_size=1,
    max_size=20,
)


@given(st.dictionaries(field_names, scalars, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_json_keys_scalars_always_kept(obj):
    out = json_key_to_map(json.dumps(obj).encode())
    assert set(out) == set(obj)
    for k, v in obj.items():
        assert out[k] == v


@given(st.dictionaries(field_names, st.none() | scalars, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_json_null_fields_always_dropped(obj):
    out = json_key_to_map(json.dumps(obj).encode())
    assert set(out) == {k for k, v in obj.items() if v is not None}


@given(
    st.dictionaries(
        field_names,
        st.one_of(st.lists(scalars, max_size=3), st.dictionaries(field_names, scalars, max_size=3)),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=100, deadline=None)
def test_nested_key_values_always_rejected(obj):
    with pytest.raises(KeyError_, match="unsupported node type"):
        json_key_to_map(json.dumps(obj).encode())


@given(st.dictionaries(field_names, scalars, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_struct_keys_always_stringified(obj):
    out = struct_key_to_map(obj)
    assert set(out) == set(obj)
    assert all(isinstance(v, str) for v in out.values())
    for k, v in obj.items():
        if isinstance(v, bool):
            assert out[k] in ("true", "false")
        elif isinstance(v, float) and v.is_integer():
            # Struct numbers are doubles; exact integrals print as ints
            assert out[k] == str(int(v))


@given(st.dictionaries(field_names, scalars | st.none(), max_size=8))
@settings(max_examples=200, deadline=None)
def test_payload_normalization_invariants(obj):
    out = json.loads(normalize_payload_json(json.dumps(obj).encode()))
    assert set(out) == set(obj)
    for k, v in obj.items():
        if isinstance(v, float) and not isinstance(v, bool) and v.is_integer():
            assert isinstance(out[k], int) and out[k] == int(v)
        else:
            assert out[k] == v


@given(
    st.dictionaries(
        field_names,
        st.lists(st.floats(allow_nan=False, allow_infinity=False), min_size=1, max_size=3),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=100, deadline=None)
def test_payload_nested_floats_never_rewritten(obj):
    # integral rewrite is top-level ONLY (reference iterates top-level
    # field names, SparkDestinationStream.java:254)
    out = json.loads(normalize_payload_json(json.dumps(obj).encode()))
    assert out == obj
