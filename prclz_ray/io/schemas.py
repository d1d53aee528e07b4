"""pyarrow.Schema registry for the engine's logical tables (SURVEY §1.5).

Replaces the reference's fixed-by-convention CSV/GeoJSON schemas
(prclz ``utils.py:45-62``, ``_parcels.py:206-212``) with declared Arrow
schemas; geometry is ISO-WKB ``binary``.
"""
import pyarrow as pa

PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

REGIONS = pa.schema([
    ("gadm_code", pa.string()),
    ("gadm", pa.string()),
    ("geometry", pa.binary()),
])

LINES = pa.schema([
    ("line_id", pa.string()),
    ("highway", pa.string()),
    ("gadm_code", pa.string()),
    ("geometry", pa.binary()),
])

BUILDINGS = pa.schema([
    ("bldg_id", pa.string()),
    ("building", pa.string()),
    ("gadm_code", pa.string()),
    ("url", pa.string()),
    ("geometry", pa.binary()),
])

BLOCKS = pa.schema([
    ("block_id", pa.string()),
    ("gadm_code", pa.string()),
    ("cell", pa.uint64()),
    ("geometry", pa.binary()),
])

PARCELS = pa.schema([
    ("block_id", pa.string()),
    ("parcel_id", pa.string()),
    ("geometry", pa.binary()),
])

COMPLEXITY = pa.schema([
    ("block_id", pa.string()),
    ("geometry", pa.binary()),
    ("complexity", pa.int32()),
    ("centroids_multipoint", pa.binary()),
])

REBLOCK = pa.schema([
    ("block_id", pa.string()),
    ("road_type", pa.string()),   # 'new' | 'existing'
    ("geometry", pa.binary()),
])

REBLOCK_SUMMARY = pa.schema([
    ("block", pa.string()),
    ("bldg_time", pa.float64()),
    ("simplify_time", pa.float64()),
    ("steiner_time", pa.float64()),
    ("num_graph_comps", pa.int32()),
    ("node_count_pre", pa.int32()),
    ("node_count_post", pa.int32()),
    ("edge_count_pre", pa.int32()),
    ("edge_count_post", pa.int32()),
    ("bldg_count", pa.int32()),
    ("num_block_coords", pa.int32()),
    ("num_block_coords_unmatched", pa.int32()),
])
