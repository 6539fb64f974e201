"""Sources: parquet table readers with column pruning and the deterministic
synthetic image+caption event-table generator (the BASELINE.json input_hint
shape, synthesized at small scale — no external data)."""
