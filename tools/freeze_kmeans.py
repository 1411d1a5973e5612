"""Re-freeze the `kmeans_assign` centroid literals
(`pipelines/_kmeans_frozen.py`): trains spherical k-means with the same
machinery IVF uses (`functions.similarity.ivf_train_centroids`, k=8,
sample_limit=4096, iters=10, seed=3) on the sf0.01 embeddings table and
rewrites the frozen module.  Run from /root/repo after any trainer change."""

import sys

sys.path.insert(0, ".")  # run from /root/repo; workers inherit cwd

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")

import ray.data as rd  # noqa: E402

from goto_eater_crawler_ray.functions.similarity import ivf_train_centroids  # noqa: E402

cent = ivf_train_centroids(
    rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet"),
    n_centroids=8,
    sample_limit=4096,
    iters=10,
    seed=3,
)

with open("goto_eater_crawler_ray/pipelines/_kmeans_frozen.py", "w") as f:
    f.write(
        '"""Frozen spherical k-means centroids for the `kmeans_assign` query.\n\n'
        "Trained ONCE offline with `functions.similarity.ivf_train_centroids`\n"
        "(k=8, sample_limit=4096, iters=10, seed=3) on the sf0.01 embeddings\n"
        "table, then frozen as literals so the Ray assignment pass and the\n"
        "DuckDB oracle twin score against the IDENTICAL model at any scale\n"
        "(the production shape: train offline, assign online).  Regenerate\n"
        'with tools/freeze_kmeans.py if the trainer changes.\n"""\n\n'
        "CENTROIDS = [\n"
    )
    for row in cent:
        f.write("    [" + ", ".join(repr(float(v)) for v in row) + "],\n")
    f.write("]\n")

print(f"frozen {cent.shape} centroids")
ray.shutdown()
