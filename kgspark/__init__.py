"""kgspark — a from-scratch, PySpark-native knowledge-graph construction engine.

Re-expresses the semantics of the reference dataflow service
(raghav-rama/knowledge-graph, a Rust axum pipeline: documents → chunks →
(entities, relationships) → graph, see /root/repo/SURVEY.md) as a pure
DataFrame job chain:

    web_pages (url, warc_ts, html, text, lang)
      → extract   (deterministic HTML→text, byte-identical, digest-checked)
      → chunk     (sentence-segmented / token-window chunking)
      → triples   (pattern-based typed entity mentions + (subj, pred, obj))
      → link      (broadcast alias-dictionary entity linking)
      → canon     (MinHash-LSH blocking + connected-components merge)
      → graph     (vertices/edges tables; BFS path search query layer)

Everything relational is stock DataFrame/Catalyst; custom work is confined to
vectorized pandas/Arrow UDFs (HTML extraction, chunking, triple extraction)
and two driver-side iterative algorithms (connected components, BFS).
"""

__version__ = "0.1.0"
