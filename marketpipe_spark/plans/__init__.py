"""Query surface: the registry of named queries (with DuckDB oracle SQL) and
the SQL view layer over the bars lake."""
