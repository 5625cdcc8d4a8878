"""Execution plans: the CDC apply pipeline (parser analog) and downstream
incremental aggregates (aggregator analog)."""
