"""Operator library: composable DataFrame-level building blocks.

Each module re-expresses one operator family from the reference's
inventory (SURVEY.md §2) as idiomatic, Catalyst-optimizable DataFrame
code. Nothing here drops to RDDs; pandas UDFs appear only in the
training-data extensions (fuzzy dedup / similarity / multimodal) where
built-ins cannot express the semantics.
"""
