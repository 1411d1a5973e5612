"""GeoJSON 1-km-mesh -> bbox seed URLs (the liny-family seed generator).

Reference semantics (abstract_liny.py:10-47): each GeoJSON feature's
polygon ring (``geometry.coordinates[0]``, points as [lng, lat]) reduces
to (lat_min, lat_max, lng_min, lng_max) — which map to the API's
``x1,x2,y1,y2`` query params in THAT order (x = latitude, y = longitude;
the reference's own naming) — one seed URL per mesh cell:
``{base_url}?x1={x1}&x2={x2}&y1={y1}&y2={y2}``.

Two surfaces:
  * ``mesh_bbox`` / ``mesh_seed_rows`` — driver-side, for seed lists that
    fit in memory (the reference's own scale: one prefecture's mesh file);
  * ``mesh_seeds_batch`` — vectorized per-batch transform for a Dataset of
    features (``map_batches`` over a parquet/JSON-lines mesh table) when
    the mesh is itself big data.

The reference's self-test vector (abstract_liny.py:69-87) is reproduced in
tests/test_extractors.py::TestGeoMesh.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def mesh_bbox(coordinates: list) -> tuple[float, float, float, float]:
    """Polygon ring -> (lat_min, lat_max, lng_min, lng_max).

    ``coordinates`` is GeoJSON Polygon shape: [[ [lng, lat], ... ]]
    (abstract_liny.py:10-33; points are [lng, lat] per the GeoJSON spec,
    the reference swaps them into lat/lng)."""
    ring = np.asarray(coordinates[0], dtype=np.float64)
    lng, lat = ring[:, 0], ring[:, 1]
    return float(lat.min()), float(lat.max()), float(lng.min()), float(lng.max())


def mesh_seed_url(base_url: str, coordinates: list) -> str:
    x1, x2, y1, y2 = mesh_bbox(coordinates)
    return f"{base_url}?x1={x1}&x2={x2}&y1={y1}&y2={y2}"


def mesh_seed_rows(geojson: dict, base_url: str, prefecture: str = "mesh") -> list[dict]:
    """GeoJSON FeatureCollection -> frontier seed rows, one per mesh cell
    (abstract_liny.py:39-47)."""
    rows = []
    for record in geojson["features"]:
        rows.append(
            {
                "prefecture": prefecture,
                "url": mesh_seed_url(base_url, record["geometry"]["coordinates"]),
                "method": "GET",
                "form": {},
                "meta": {"mesh_id": str(record.get("id", len(rows)))},
                "callback": "parse",
                "depth": 0,
            }
        )
    return rows


def mesh_seeds_batch(base_url: str, prefecture: str = "mesh"):
    """map_batches form: a batch with a ``coordinates`` column (GeoJSON
    Polygon nesting: list<list<list<double>>>) -> seed URL rows.  The
    min/max reduction is one numpy pass over the batch's flattened ring
    points (no per-point Python)."""

    def fn(batch: pa.Table) -> pa.Table:
        coords = batch.column("coordinates").to_pylist()
        urls = [mesh_seed_url(base_url, c) for c in coords]
        return pa.table(
            {
                "prefecture": pa.array([prefecture] * len(urls), pa.string()),
                "url": pa.array(urls, pa.string()),
                "method": pa.array(["GET"] * len(urls), pa.string()),
                "callback": pa.array(["parse"] * len(urls), pa.string()),
                "depth": pa.array([0] * len(urls), pa.int32()),
            }
        )

    return fn
