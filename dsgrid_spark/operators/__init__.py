"""Relational operators of the engine, each an idiomatic Spark composition."""
