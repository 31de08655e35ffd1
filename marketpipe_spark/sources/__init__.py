"""Data sources: deterministic fake bar generator (the reference's test
backbone) and driver-side provider adapter scaffolding."""
