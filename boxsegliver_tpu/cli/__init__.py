"""CLI entry points (reference entry/main.py, main_g.py)."""
