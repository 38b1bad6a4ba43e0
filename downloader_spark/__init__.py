"""downloader_spark — PySpark-native crawl + webtext analytics engine.

A from-scratch rebuild of the capabilities of tvaroska/downloader
(reference at /root/reference) as a distributed Spark engine: a URL
frontier + fetch scheduler over snapshot tables of Common-Crawl-style
pages, with the webpage→text/markdown conversion path as a vectorized
Arrow UDF, plus the training-data pipeline operators (dedup, similarity
search, text analysis) that make the engine useful at 100 TB scale.
"""

__version__ = "0.1.0"
