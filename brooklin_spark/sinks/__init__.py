"""Transport providers (sinks): envelope DataFrame → configured writer.

The Spark analog of the TransportProvider SPI (reference:
datastream-server-api/.../transport/TransportProvider.java:15-65 —
send/flush/close + admin destination provisioning). Structured Streaming's
sink + checkpoint machinery replaces send callbacks, flush ordering and the
flush-then-commit at-least-once invariant (EventProducer.java:296-385,
AbstractKafkaBasedConnectorTask.maybeCommitOffsets:649-740) wholesale.
"""

from brooklin_spark.sinks.registry import SINKS, build_writer  # noqa: F401
