"""DataFrame -> DataFrame operators: joins, dedup, similarity, stats."""
