"""Single-node crawl simulator: the executable spec / parity oracle."""
