"""Final per-prefecture export: the reference's publishing step.

The reference writes one CSV per prefecture with a FIXED 12-column order
(reference: goto_eat_scrapy/settings.py:100-113, FEED_EXPORT_FIELDS) and
then sorts each CSV by (shop_name, address, genre_name) for diff-stable
publishing (csvsort task, README.md:93-105).  Ray-native equivalent:

    items parquet -> global sort (range shuffle) -> per-prefecture
    partitioned write with the canonical column projection.

The sort is the engine's one intentional all-to-all shuffle (SURVEY.md
§7.3 'final export').
"""

from __future__ import annotations

import os

import pyarrow as pa

CSV_COLUMN_ORDER = [
    # settings.py:100-113 verbatim order
    "shop_name",
    "address",
    "tel",
    "genre_name",
    "zip_code",
    "official_page",
    "opening_hours",
    "closing_day",
    "area_name",
    "detail_page",
    "provided_lat",
    "provided_lng",
]


def export_sorted(items_dir: str, out_dir: str, file_format: str = "csv"):
    """items parquet dir -> per-prefecture sorted export.

    Returns the list of written prefecture partitions."""
    import ray.data as rd

    ds = rd.read_parquet(items_dir, columns=CSV_COLUMN_ORDER + ["prefecture"])
    # csvsort parity: sort by shop_name, then address, then genre
    ds = ds.sort(["prefecture", "shop_name", "address", "genre_name"])
    projected = ds.map_batches(
        lambda t: t.select(["prefecture"] + CSV_COLUMN_ORDER), batch_format="pyarrow"
    )
    writer = projected.write_csv if file_format == "csv" else projected.write_parquet
    writer(out_dir, partition_cols=["prefecture"]) if _supports_partition_cols(writer) else _write_partitioned(projected, out_dir, file_format)
    return sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []


def _supports_partition_cols(writer) -> bool:
    import inspect

    try:
        return "partition_cols" in inspect.signature(writer).parameters
    except (TypeError, ValueError):
        return False


def _write_partitioned(ds, out_dir: str, file_format: str) -> None:
    """Fallback: partition by prefecture via per-group write tasks."""
    import pandas as pd

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        pref = df["prefecture"].iloc[0]
        path = os.path.join(out_dir, f"prefecture={pref}")
        os.makedirs(path, exist_ok=True)
        # Ray's groupby range-partitions by the key only; within-group order
        # is NOT preserved from the upstream sort — sort here (csvsort parity)
        body = df.sort_values(["shop_name", "address", "genre_name"])[CSV_COLUMN_ORDER]
        if file_format == "csv":
            body.to_csv(os.path.join(path, "part-0.csv"), index=False)
        else:
            body.to_parquet(os.path.join(path, "part-0.parquet"), index=False)
        return pd.DataFrame({"prefecture": [pref], "rows": [len(df)]})

    ds.groupby("prefecture").map_groups(write_group, batch_format="pandas").materialize()
