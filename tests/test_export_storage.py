"""Export pipeline + storage adapter tests."""

import os

import pyarrow as pa
import pytest

from goto_eater_crawler_ray.pipelines.export import CSV_COLUMN_ORDER, export_sorted
from goto_eater_crawler_ray.sources import storage


def test_storage_roundtrip_table(tmp_path):
    t = pa.table({"a": [3, 1, 2], "b": ["x", "y", "z"]})
    uri = str(tmp_path / "tbl")
    storage.write_dataset(t, uri)
    back = storage.read_table(uri)
    assert back.equals(t)


def test_storage_roundtrip_dataset(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.range(100)
    uri = str(tmp_path / "ds")
    storage.write_dataset(ds, uri)
    assert storage.read_dataset(uri).count() == 100


def test_export_sorted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    items_dir = str(tmp_path / "items")
    os.makedirs(items_dir)
    rows = []
    for pref in ("aomori", "tochigi"):
        for i in (3, 1, 2):
            rows.append(
                {c: f"{c}{i}" for c in CSV_COLUMN_ORDER} | {"prefecture": pref, "shop_name": f"shop{i}"}
            )
    pq.write_table(pa.Table.from_pylist(rows), os.path.join(items_dir, "part.parquet"))
    out = str(tmp_path / "export")
    export_sorted(items_dir, out, file_format="csv")
    parts = sorted(os.listdir(out))
    assert any("aomori" in p for p in parts) and any("tochigi" in p for p in parts)
    # column order + sortedness inside one partition
    import glob

    import pandas as pd

    f = glob.glob(os.path.join(out, "*aomori*", "*.csv"))[0]
    df = pd.read_csv(f)
    assert list(df.columns) == CSV_COLUMN_ORDER
    assert df["shop_name"].tolist() == ["shop1", "shop2", "shop3"]


class TestWritePartitionedResumable:
    def test_resume_skips_finished_partitions(self, ray_session, tmp_path):
        """Crash recovery contract: finished partitions (with _SUCCESS)
        are skipped on re-run; torn partitions (no _SUCCESS) are
        rewritten; the final data is complete and non-duplicated."""
        import os

        import numpy as np
        import pyarrow as pa
        import pyarrow.dataset as pads
        import ray.data as rd

        from goto_eater_crawler_ray.sources.storage import write_partitioned_resumable

        rng = np.random.default_rng(7)
        t = pa.table(
            {
                "event_type": pa.array(rng.choice(["a", "b", "c"], 300)),
                "value": pa.array(rng.uniform(0, 1, 300), pa.float64()),
            }
        )
        out = str(tmp_path / "sink")
        written, skipped = write_partitioned_resumable(rd.from_arrow(t), out, "event_type")
        assert sorted(written) == ["a", "b", "c"] and skipped == []
        for k in "abc":
            assert os.path.exists(os.path.join(out, f"event_type={k}", "_SUCCESS"))

        # simulate a crash: partition b is torn (marker removed, data stays),
        # partition c is intact, partition a vanished entirely
        os.remove(os.path.join(out, "event_type=b", "_SUCCESS"))
        import shutil

        shutil.rmtree(os.path.join(out, "event_type=a"))

        written2, skipped2 = write_partitioned_resumable(rd.from_arrow(t), out, "event_type")
        assert sorted(written2) == ["a", "b"]  # c skipped, a+b rewritten
        assert skipped2 == ["c"]

        back = pads.dataset(out, partitioning="hive").to_table()
        assert back.num_rows == 300  # complete, no duplicates
        got = back.to_pandas().groupby("event_type").size()
        want = t.to_pandas().groupby("event_type").size()
        assert dict(got) == dict(want)
