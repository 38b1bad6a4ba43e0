"""Crawl planning layer: frontier, politeness, priority, wave loop
(SURVEY §2.5, §2.7, §2.9, §3 rebuild-equivalents)."""
