"""Structured Streaming helpers (beyond reference scope, SURVEY §2.11)."""
