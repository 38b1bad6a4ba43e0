"""Relational operator layer (SURVEY §2.5-2.8): joins, aggregations,
top-k/priority windows, dedup family, similarity search."""
