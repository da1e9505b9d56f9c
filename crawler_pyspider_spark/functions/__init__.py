"""Scalar / vectorized functions: URL canonicalization, taskid hashing,
HTML text+link extraction, text analytics.  Everything Python-side is an
Arrow-batched pandas UDF — no row-at-a-time Python UDFs anywhere.
"""
