"""Re-freeze the product-quantization literals
(`pipelines/_pq_frozen.py`): trains per-subspace Lloyd codebooks with
`functions.similarity.pq_train_codebooks` (m=8, k=16, sample_limit=4096,
iters=10, seed=5) on the sf0.01 embeddings table, freezes the sf0.01
vec_id=0 embedding as the ADC query vector, and rewrites the frozen
module.  Run from /root/repo after any trainer change."""

import sys

sys.path.insert(0, ".")  # run from /root/repo; workers inherit cwd

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")

import ray.data as rd  # noqa: E402

from goto_eater_crawler_ray.functions.similarity import pq_train_codebooks  # noqa: E402

emb = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
books = pq_train_codebooks(emb, m=8, k=16, sample_limit=4096, iters=10, seed=5)
q = emb.filter(expr="vec_id == 0").take_all()[0]["embedding"]

with open("goto_eater_crawler_ray/pipelines/_pq_frozen.py", "w") as f:
    f.write(
        '"""Frozen product-quantization model for the `pq_codes` /\n'
        "`pq_adc_topk` queries (Jégou/Douze/Schmid, TPAMI 2011).\n\n"
        "CODEBOOKS: (m=8 subspaces, k=16 codes, 8 dims) Lloyd codebooks\n"
        "trained ONCE offline with `functions.similarity.pq_train_codebooks`\n"
        "(sample_limit=4096, iters=10, seed=5) on the sf0.01 embeddings\n"
        "table; QUERY is the frozen sf0.01 vec_id=0 embedding.  CC (the\n"
        "codeword squared norms) and LUT (the query->codeword squared\n"
        "distances in int64 micro-units) are DERIVED here at import time so\n"
        "the Ray passes and the generated DuckDB twins always share the\n"
        "identical literals.  Regenerate with tools/freeze_pq.py if the\n"
        'trainer changes.\n"""\n\n'
        "import numpy as np\n\n"
        "CODEBOOKS = [\n"
    )
    for s in range(books.shape[0]):
        f.write("    [\n")
        for row in books[s]:
            f.write("        [" + ", ".join(repr(float(v)) for v in row) + "],\n")
        f.write("    ],\n")
    f.write("]\n\nQUERY = [" + ", ".join(repr(float(v)) for v in q) + "]\n\n")
    f.write(
        "def _derived():\n"
        "    from ..functions.importance import _round_half_away\n\n"
        "    B = np.asarray(CODEBOOKS, np.float64)\n"
        "    m, k, sub = B.shape\n"
        "    q = np.asarray(QUERY, np.float64).reshape(m, sub)\n"
        "    cc = (B ** 2).sum(-1)\n"
        "    lut = _round_half_away(1e6 * ((q[:, None, :] - B) ** 2).sum(-1))\n"
        "    return cc, lut.astype(np.int64)\n\n\n"
        "CC, LUT = _derived()\n"
    )

print(f"frozen codebooks {books.shape}, query dim {len(q)}")
ray.shutdown()
