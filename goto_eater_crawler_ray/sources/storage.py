"""Storage adapter: Lance when importable, parquet otherwise.

BASELINE.json targets Lance tables; this sandbox doesn't ship the lance
package (SURVEY.md §1.4 note), so every engine table goes through this
thin adapter: identical directory layout + fragment-per-partition
semantics either way, and the Lance path lights up automatically where
the package exists.

    write_dataset(ds_or_table, uri)   # ray Dataset | pyarrow Table
    read_dataset(uri) -> ray Dataset
    read_table(uri)   -> pyarrow Table
"""

from __future__ import annotations

import os

import pyarrow as pa

try:
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def write_dataset(data, uri: str, mode: str = "overwrite") -> None:
    """Write a ray Dataset or pyarrow Table to `uri` (dir)."""
    import ray.data as rd

    if HAVE_LANCE:
        import lance

        if isinstance(data, rd.Dataset):
            data = pa.concat_tables(data.to_arrow_refs_resolved()) if hasattr(data, "to_arrow_refs_resolved") else pa.Table.from_pandas(data.to_pandas())
        lance.write_dataset(data, uri, mode=mode)
        return
    if isinstance(data, pa.Table):
        import pyarrow.parquet as pq

        os.makedirs(uri, exist_ok=True)
        pq.write_table(data, os.path.join(uri, "part-0.parquet"))
    else:
        if mode == "overwrite":
            import shutil

            shutil.rmtree(uri, ignore_errors=True)
        data.write_parquet(uri)


def read_dataset(uri: str):
    import ray.data as rd

    if HAVE_LANCE and os.path.isdir(uri) and any(f.endswith(".lance") for f in os.listdir(uri)):
        return rd.read_lance(uri)
    return rd.read_parquet(uri)


def read_table(uri: str) -> pa.Table:
    if HAVE_LANCE and os.path.isdir(uri) and any(f.endswith(".lance") for f in os.listdir(uri)):
        import lance

        return lance.dataset(uri).to_table()
    import pyarrow.dataset as pads

    return pads.dataset(uri).to_table()
