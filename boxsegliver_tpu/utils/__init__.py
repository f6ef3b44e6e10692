"""Shared utilities: logging, timing."""
