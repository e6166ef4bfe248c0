"""Test-fixture connectors — reference parity with the testcommon pair:

- DummyConnector (datastream-testcommon/.../DummyConnector.java): a trivial
  connector that validates its config (requires dummyProperty=dummyValue,
  source must be the well-known DummySource) and produces nothing; used to
  exercise the control-plane CRUD paths without a data plane.
- BrokenConnector (datastream-testcommon/.../BrokenConnector.java): fails
  at creation; used to verify that a failed create REJECTS the datastream
  instead of leaving half-created state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from brooklin_spark.model import ENVELOPE_SCHEMA, PipelineSpec
from brooklin_spark.sources.registry import source

#: DummyConnector.VALID_DUMMY_SOURCE analog
VALID_DUMMY_SOURCE = "dummy://DummySource"


@source("dummy")
def dummy_source(spark: SparkSession, spec: PipelineSpec) -> DataFrame:
    """Config-validating no-op connector (DummyConnector.java:38-45,61-66)."""
    if spec.metadata.get("dummyProperty") != "dummyValue":
        raise ValueError(
            "Invalid config value for dummyProperty. Expected: dummyValue"
        )
    if spec.source_uri != VALID_DUMMY_SOURCE:
        raise ValueError(f"Invalid source ({spec.source_uri}) in datastream.")
    return spark.createDataFrame([], ENVELOPE_SCHEMA)


@source("broken")
def broken_source(spark: SparkSession, spec: PipelineSpec) -> DataFrame:
    """Always fails to build (BrokenConnector.java:38-42)."""
    raise RuntimeError("BrokenConnector: failed to create connector task")
