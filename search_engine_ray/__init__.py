"""search_engine_ray — a Ray-Data-native full-text index build + query engine.

A brand-new implementation (not a port) with the query/data-processing
capabilities of the reference Rust engine ``kev1N916/search_engine``
(SPIMI inverted-index builder + positional query engine; see SURVEY.md for
the structural analysis with file:line citations into /root/reference).

Layout:
  functions/  pure kernels: text extraction/cleaning, VB + delta codecs,
              hashing/minhash/simhash, text quality metrics
  sources/    corpus synthesis + parquet readers (column-pruned)
  stages/     Dataset stage builders: extract, tokenize (actor pool),
              deterministic id assignment, postings merge, index write
  pipelines/  end-to-end build pipeline + training-data pipelines
              (dedup, ANN, text analysis)
  query/      query engine (boolean/phrase/proximity/fuzzy/tf-idf/BM25)
              + brute-force oracle
  state/      per-partition lineage manifests for checkpoint/resume
"""

from search_engine_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
