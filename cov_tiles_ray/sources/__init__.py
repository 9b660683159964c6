"""Sources: deterministic synthetic corpora + table readers."""
