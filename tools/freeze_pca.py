"""Re-freeze the `pca_project_frozen` model literals
(`pipelines/_pca_frozen.py`): computes the top principal component of the
sf0.01 embeddings table with the same two-moment math `pca_project` uses
(mean + covariance -> eigh -> sign fixed by largest-|loading| positive),
then rewrites the frozen module with MEAN, PC1 and the precomputed offset
C0 = MEAN . PC1 so the Ray pass and the DuckDB twin subtract the IDENTICAL
scalar.  Run from /root/repo after any trainer change."""

import sys

sys.path.insert(0, ".")  # run from /root/repo

import numpy as np
import pyarrow.parquet as pq

t = pq.read_table("/root/testdata/sf0.01/embeddings.parquet", columns=["embedding"])
emb = np.stack(t.column("embedding").to_pandas().to_numpy())
n, d = emb.shape
mu = emb.sum(axis=0) / n
cov = (emb.T @ emb) / n - np.outer(mu, mu)
_, vecs = np.linalg.eigh(cov)
pc1 = vecs[:, -1]
if pc1[np.argmax(np.abs(pc1))] < 0:
    pc1 = -pc1
c0 = float(np.dot(mu, pc1))

with open("goto_eater_crawler_ray/pipelines/_pca_frozen.py", "w") as f:
    f.write(
        '"""Frozen top-principal-component model for the `pca_project_frozen`\n'
        "query: MEAN and PC1 computed ONCE offline from the sf0.01 embeddings\n"
        "(two-moment PCA, sign fixed largest-|loading|-positive), plus the\n"
        "precomputed offset C0 = MEAN . PC1, all frozen as literals so the Ray\n"
        "projection pass and the DuckDB oracle twin evaluate the IDENTICAL\n"
        "affine map x . PC1 - C0 at any scale (the production shape: fit the\n"
        "projector offline, project the corpus online).  Regenerate with\n"
        'tools/freeze_pca.py if the fit changes.\n"""\n\n'
    )
    f.write("MEAN = [" + ", ".join(repr(float(v)) for v in mu) + "]\n\n")
    f.write("PC1 = [" + ", ".join(repr(float(v)) for v in pc1) + "]\n\n")
    f.write(f"C0 = {c0!r}\n")

print(f"froze d={d} model from n={n} embeddings; C0={c0!r}")
