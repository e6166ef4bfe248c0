"""Source registry: connector name → builder(spark, spec) → DataFrame.

The Spark analog of the reference's ConnectorFactory wiring
(DatastreamServer.java connector bootstrap): a pipeline spec names its
connector; the builder turns spec.source_uri into a (possibly streaming)
envelope DataFrame.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from brooklin_spark.model import PipelineSpec

SourceBuilder = Callable[[SparkSession, PipelineSpec], DataFrame]

SOURCES: dict[str, SourceBuilder] = {}


def source(name: str) -> Callable[[SourceBuilder], SourceBuilder]:
    def deco(fn: SourceBuilder) -> SourceBuilder:
        SOURCES[name] = fn
        return fn

    return deco


def build_source(spark: SparkSession, spec: PipelineSpec) -> DataFrame:
    from brooklin_spark.sources import (  # noqa: F401
        dirwatch,
        file_source,
        fixtures,
        kafka_source,
        rate_source,
    )

    if spec.connector not in SOURCES:
        raise ValueError(f"no source builder for connector {spec.connector!r}")
    return SOURCES[spec.connector](spark, spec)
