"""Operators: relational closure, UDF surface, LLM-data-pipeline ops."""
