"""Relational/dataflow operators: index build, BM25 scoring, WAND, dedup, ANN."""
