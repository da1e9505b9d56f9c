"""Relational operators of the frontier engine: ingest/merge decision
table, politeness-ranked select, retry ladder, robots gating, seen-set,
dedup and similarity operators."""
