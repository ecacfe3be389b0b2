"""Plan inspection helpers (explain/pushdown assertions)."""
