"""europa_spark — PySpark-native near-duplicate detection + clustering engine.

A brand-new, Spark-first re-expression of the duplicate-finding semantics of
belloabdoul/Europa (a .NET duplicate-file finder; see SURVEY.md) over
Common-Crawl-style webtext tables:

    documents(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Stages (each a DataFrame transformation, no driver-side data):
  extract    — byte-exact text extraction (FIXTURES.md §2), built-ins only
  exact      — two-pass prefix-hash cascade -> sha256 exact-dup groups
  minhash    — MinHash signatures -> salted LSH band self-join -> Jaccard verify
  simhash    — 64-bit SimHash -> pigeonhole band join -> Hamming verify
  substring  — winnowed k-gram fingerprints -> vote-count join
  cluster    — union-find over confirmed pairs via iterative self-joins
  checkpoint — resumable parquet checkpoint tables with lineage counters
"""

__version__ = "0.1.0"
