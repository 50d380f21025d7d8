"""LLM-data-pipeline operators — beyond-reference extensions (the
reference, serverboards/exosql, is a dashboard SQL engine with none of
these; see SURVEY.md §2.9/§2.10 absence notes).

Design rule for 100 TB: every operator here is a composition of native
DataFrame ops (JVM, whole-stage codegen) unless the semantics genuinely
need Python — and then it's an Arrow-batched Pandas UDF / mapInPandas,
never a row-at-a-time Python UDF.

- :mod:`.dedup` — exact, MinHash+LSH, SimHash, n-gram Jaccard dedup.
- :mod:`.similarity` — brute-force cosine top-k; random-hyperplane LSH
  bucketed ANN for the scale path.
- :mod:`.text` — language ID, quality scoring, token counting, document
  fingerprinting.
- :mod:`.multimodal` — binary-column conventions + decode/resize stubs
  (real Spark plumbing, stubbed codecs — the image/audio libraries are
  not in this container).
"""

from exosql_spark.operators import dedup, similarity, text, multimodal  # noqa: F401

__all__ = ["dedup", "similarity", "text", "multimodal"]
