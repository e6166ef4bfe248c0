"""Composable DataFrame operators beyond Spark's built-ins (dedup families,
similarity search, as-of joins). All JVM-side expression compositions —
no Python row loops."""
