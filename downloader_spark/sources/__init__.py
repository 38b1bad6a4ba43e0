"""Sources: synthetic page generators + snapshot table layer (SURVEY §2.1)."""
