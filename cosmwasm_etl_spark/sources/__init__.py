"""Sources: the ordered change-event log (batch replay + structured streaming)
and the deterministic synthetic generator used for tests/benchmarks."""
