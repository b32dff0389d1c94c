"""Validation rule engine (SURVEY §7 step 6)."""
