"""Per-family registry row modules (split from kgx/queries.py)."""
