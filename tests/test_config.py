"""Config model unit tests (reference: DestinationConfigTest.java:14-77,
SpecifierServiceTest.java:21-56)."""

import pytest

from conduit_connector_s3_iceberg_spark.session import (
    AWS_REGIONS,
    CATALOG_IMPLS,
    REQUIRED_KEYS,
    ConfigError,
    ConnectorConfig,
    spec,
)

VALID = {
    "catalog.name": "demo",
    "catalog.catalog-impl": "org.apache.iceberg.rest.RESTCatalog",
    "namespace": "ns",
    "table.name": "tbl",
    "s3.access-key-id": "ak",
    "s3.secret-access-key": "sk",
    "s3.region": "us-east-1",
}


def test_round_trip():
    cfg = ConnectorConfig.from_map(dict(VALID))
    assert cfg.qualified_table == "demo.ns.tbl"
    assert cfg.s3_endpoint is None


@pytest.mark.parametrize("missing", REQUIRED_KEYS)
def test_each_missing_required_key_rejected(missing):
    raw = {k: v for k, v in VALID.items() if k != missing}
    with pytest.raises(ConfigError, match=f"missing required config parameter: {missing}"):
        ConnectorConfig.from_map(raw)


def test_unknown_key_rejected_but_catalog_passthrough_kept():
    raw = dict(VALID, **{"catalog.uri": "http://localhost:8181"})
    cfg = ConnectorConfig.from_map(raw)
    assert cfg.catalog_properties == {"uri": "http://localhost:8181"}
    with pytest.raises(ConfigError, match="unknown config parameter: bogus"):
        ConnectorConfig.from_map(dict(VALID, bogus="x"))


def test_inclusion_validations():
    with pytest.raises(ConfigError, match="invalid catalog.catalog-impl"):
        ConnectorConfig.from_map(dict(VALID, **{"catalog.catalog-impl": "com.example.X"}))
    with pytest.raises(ConfigError, match="invalid s3.region"):
        ConnectorConfig.from_map(dict(VALID, **{"s3.region": "moon-base-1"}))


def test_spec_shape():
    s = spec()
    for key in REQUIRED_KEYS:
        assert s[key]["required"] is True
    assert s["catalog.catalog-impl"]["inclusion"] == list(CATALOG_IMPLS)
    assert s["s3.region"]["inclusion"] == list(AWS_REGIONS)
    assert not s["s3.endpoint"]["required"]
