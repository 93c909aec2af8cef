"""Reusable column/DataFrame function library."""
