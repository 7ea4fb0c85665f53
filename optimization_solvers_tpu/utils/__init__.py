"""Observability and front-end helpers (reference L5/L6)."""
