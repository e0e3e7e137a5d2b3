"""gcflow — a Ray-Data-native log parse → enrich → route → aggregate engine.

From-scratch re-expression of the query/data-processing capabilities of
binaryfoo/gclog-parser (see SURVEY.md) over Parquet transcript tables
(conv_id, turn_idx, role, text, tool, ts), built on ray.data.Dataset +
map_batches over zero-copy Arrow, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
