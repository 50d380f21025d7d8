"""Catalog entry modules — one module per SURVEY.md §2 operator family.

Conventions (driver hash-compat):
- Every computed column is aliased identically in the Spark callable and
  the DuckDB oracle SQL.
- Double-typed aggregates are wrapped ``round(x, 4)`` on BOTH sides so
  accumulation-order differences between engines can't flip the value hash.
- Integer sums are cast to bigint on both sides (DuckDB sums ints to
  int128; Spark to bigint).
- Any LIMIT/OFFSET query orders by a unique key so the selected row set is
  deterministic across engines.
"""
