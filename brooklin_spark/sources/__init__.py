"""Source connectors: each returns an envelope-schema DataFrame (batch) or
streaming DataFrame (readStream), mirroring the reference's Connector SPI
(server-api Connector.java:30-163) as a thin "configured reader" protocol.
"""

from brooklin_spark.sources.registry import (  # noqa: F401
    SOURCES,
    build_source,
    commit_source,
)
