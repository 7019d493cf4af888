"""Operators: ingest transforms, views, analytics, maintenance, scale-out."""
