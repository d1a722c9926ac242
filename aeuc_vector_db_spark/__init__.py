"""aeuc_vector_db_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Constitutional-Solutions/aeuc-vector-db.

The reference (read-only at /root/reference) is a single-process, in-memory
Python+NumPy vector database. This package re-expresses its entire surface
— typed embedding storage, brute-force k-NN under four similarity metrics
with metadata pre-filtering, φ-band auto-clustering, JSONL import/export,
hash-chained audit — as declarative Spark DataFrame pipelines, plus the
scale-out extensions a 100 TB training-data pipeline needs (dedup families,
ANN search, text analysis, multimodal columns, streaming ingest).

Design rules (see SURVEY.md):
- DataFrame/SQL first; Catalyst plans everything; no RDDs.
- All vector math in DOUBLE via SQL higher-order functions (zip_with /
  aggregate / transform) so it runs inside whole-stage codegen — no
  per-row Python.
- Pandas UDFs only where built-ins can't express the op (φ-weighted fast
  path, multimodal decode).
- Every operator has a deterministic formulation (total ORDER BY, fixed
  rounding, sha2 surrogate ids) so results hash-match a DuckDB oracle.
"""

from aeuc_vector_db_spark.functions.similarity import similarity_col
from aeuc_vector_db_spark.operators.clustering import (
    auto_cluster_phi,
    centroids,
    form_pglyphs,
    inertia,
    with_phi_band,
)
from aeuc_vector_db_spark.operators.search import (
    knn_search,
    knn_search_batch,
    knn_search_batch_arrow,
    search_pglyphs,
    two_level_search,
)
from aeuc_vector_db_spark.schemas import (
    IGLYPH_SCHEMA,
    PGLYPH_SCHEMA,
    VECTOR_ENTRY_SCHEMA,
)
from aeuc_vector_db_spark.session import get_spark
from aeuc_vector_db_spark.vector_field import VectorField

__version__ = "0.1.0"

# Public API mirrors the reference's __init__ re-exports
# (/root/reference/aeuc_vector_db/__init__.py:11-28): record types →
# StructTypes, similarity dispatch → Column builder, clustering
# primitives → DataFrame operators, VectorFieldDB → VectorField.
__all__ = [
    "IGLYPH_SCHEMA",
    "PGLYPH_SCHEMA",
    "VECTOR_ENTRY_SCHEMA",
    "VectorField",
    "similarity_col",
    "form_pglyphs",
    "with_phi_band",
    "auto_cluster_phi",
    "centroids",
    "inertia",
    "knn_search",
    "knn_search_batch",
    "knn_search_batch_arrow",
    "search_pglyphs",
    "two_level_search",
    "get_spark",
    "__version__",
]
