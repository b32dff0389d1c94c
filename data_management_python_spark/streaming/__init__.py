"""Incremental / streaming layer (SURVEY §2.9)."""
