"""Distributed stages: every per-record transform is ``map_batches`` over
Arrow batches; stateful stages are callable-class actor pools; wide steps
(as-of join, windows, dedup, grouped stats) are groupby/sort compositions."""
