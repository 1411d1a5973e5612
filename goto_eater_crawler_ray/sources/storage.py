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


def write_partitioned_resumable(ds, out_dir: str, partition_col: str):
    """RESUMABLE partitioned sink: one hive-style directory per distinct
    ``partition_col`` value, each stamped with a ``_SUCCESS`` marker
    when its data is fully written.  A re-run after a crash prunes the
    finished keys BEFORE any write work (distributed filter — the
    skipped partitions' rows never leave the scan), writes only the
    missing partitions, and stamps them.  This is the failed-run
    recovery contract BASELINE.md's 100-TB story requires: output is
    never one giant file, and a retry costs only the unfinished share.

    ``partition_col`` must be a bounded-cardinality key (shard id, key
    range, category) — the directory-per-value layout is the point.
    Returns (written_keys, skipped_keys), both sorted lists of strings.
    """
    import inspect

    import pyarrow.compute as pc
    import ray.data as rd  # noqa: F401

    os.makedirs(out_dir, exist_ok=True)
    prefix = f"{partition_col}="
    finished = {
        d[len(prefix):]
        for d in os.listdir(out_dir)
        if d.startswith(prefix) and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
    }
    # a partition dir WITHOUT _SUCCESS is a torn write from a killed run:
    # clear it so the re-write starts clean (idempotent overwrite per key)
    import shutil

    for d in list(os.listdir(out_dir)):
        if d.startswith(prefix) and d[len(prefix):] not in finished:
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)

    if finished:
        fin = pa.array(sorted(finished), pa.string())

        def drop_finished(t: pa.Table) -> pa.Table:
            keys = pc.cast(t[partition_col], pa.string())
            return t.filter(pc.invert(pc.is_in(keys, value_set=fin)))

        ds = ds.map_batches(drop_finished, batch_format="pyarrow")

    writer = ds.write_parquet
    if "partition_cols" in inspect.signature(writer).parameters:
        writer(out_dir, partition_cols=[partition_col])
    else:  # per-group fallback for Ray versions without hive partitioning
        def write_group(df):
            val = str(df[partition_col].iloc[0])
            path = os.path.join(out_dir, f"{partition_col}={val}")
            os.makedirs(path, exist_ok=True)
            df.to_parquet(os.path.join(path, "part-0.parquet"), index=False)
            return df.head(0)

        ds.groupby(partition_col).map_groups(write_group).materialize()

    written = set()
    for d in os.listdir(out_dir):
        if d.startswith(prefix):
            val = d[len(prefix):]
            if val not in finished:
                open(os.path.join(out_dir, d, "_SUCCESS"), "w").close()
                written.add(val)
    return sorted(written), sorted(finished)
