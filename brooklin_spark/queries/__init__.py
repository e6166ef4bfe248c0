"""Oracle-checked query definitions, one module per operator family.

Import ``brooklin_spark.registry.load_all()`` to populate the registries.

Determinism policy for DuckDB-oracle hash parity:
- monetary/quantity aggregates: DECIMAL(12,2) arithmetic (exact, ordering-
  independent) with the final value cast to DOUBLE — bit-identical in both
  engines regardless of aggregation order;
- float-native math (cosine similarity): computed in double, rounded to 6
  decimals — intrinsic cross-engine noise is ~1e-16, far below the grid;
- timestamps in output: formatted as strings (yyyy-MM-dd[ HH:mm:ss]) to
  dodge stringification differences;
- any top-k / row_number: total ordering with a unique-key tie-break.
"""
