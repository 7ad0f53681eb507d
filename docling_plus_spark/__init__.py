"""docling-plus-spark: PySpark-native web-page main-content extraction engine.

A from-scratch reimplementation of the capabilities of
``snps-sachinsi/docling-plus`` as vectorized Arrow/pandas UDF stages over
DataFrames of Common-Crawl-style web pages
(``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``).
"""

__version__ = "0.1.0"
