"""Distributed encode/decode jobs (pure partition-parallel pandas stages)."""
