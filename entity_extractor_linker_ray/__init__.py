"""entity_extractor_linker_ray — a Ray-Data-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference ``janschachtschabel/entity-extractor-linker``.

From-scratch design (NOT a port): streaming ``ray.data.Dataset``
pipelines of ``map_batches`` over Arrow batches, actor pools for
stateful stages (LLM client, KB snapshot, caches), groupby/aggregate
for the wide steps, partitioned Parquet checkpoints for resumability.

Reference semantics are cited per function as ``file:line`` inside
``/root/reference/``.
"""

from entity_extractor_linker_ray.config import DEFAULT_CONFIG, get_config

__all__ = ["DEFAULT_CONFIG", "get_config"]
__version__ = "0.1.0"
