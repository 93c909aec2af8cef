"""Operator library: relational surface (SURVEY §2.2) + LLM-pipeline ops."""
