"""Re-freeze the crawl determinism pins (`CRAWL_PIN_*` in
pipelines/queries.py): runs the golden-scale crawl end-to-end and prints
the canonical md5 of the lineage and documents tables.  Paste the output
values into `CRAWL_PIN_DOCUMENTS_MD5` / `CRAWL_PIN_LINEAGE_MD5` whenever
engine semantics change intentionally (a pin diff on an unintended change
is the point of the pin)."""

import sys

sys.path.insert(0, ".")  # run from /root/repo; workers inherit cwd

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")

from goto_eater_crawler_ray.pipelines.queries import q_crawl_determinism  # noqa: E402

t = q_crawl_determinism("/root/testdata/sf0.001")
for metric, value in zip(t.column("metric").to_pylist(), t.column("value").to_pylist()):
    print(f"{metric} = {value}")
ray.shutdown()
