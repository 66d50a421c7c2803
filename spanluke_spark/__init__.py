"""spanluke_spark — a PySpark-native legal knowledge-graph construction engine.

From-scratch reimplementation (NOT a port) of the data-processing capabilities
of the reference NER pipeline (lambdavi/SpanLuke, surveyed in /root/repo/SURVEY.md),
grafted into a distributed KG-construction pipeline:

    pages(url, warc_ts, html, text, lang)
      -> extract text (deterministic, byte-identical per url)
      -> tokenize -> score spans (pluggable scorer, pandas UDFs)
      -> decode mentions -> link (broadcast alias + ANN rerank)
      -> canonicalize (connected components)
      -> (subj, pred, obj) triples with per-partition lineage + resume.

Everything is DataFrame-first: Catalyst plans the relational work; vectorized
pandas/Arrow UDFs carry only the non-relational kernels (HTML extraction,
Python-semantics tokenization, span scoring/decoding).
"""

__version__ = "0.1.0"
