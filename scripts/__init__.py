"""Utility scripts package (importable for tests)."""
