"""Freeze the BPE-merge oracle pins (`BPE_PINS` in pipelines/queries.py).

Runs the INDEPENDENT single-process reference implementation
(`functions/bpe.bpe_train_local` — textbook Sennrich alg., no Ray, no code
shared with the distributed trainer) over the documents table of each gate
scale and prints the Python literal to paste into `BPE_PINS`.  The SQL
twin serves these frozen rows keyed by `count(*) FROM documents`, so the
driver's hash check compares the distributed trainer against a genuinely
independent implementation — the frozen-model oracle contract.

No Ray needed: the reference path is plain Python + pyarrow.
"""

import sys

sys.path.insert(0, ".")  # run from /root/repo

import pyarrow.parquet as pq

from goto_eater_crawler_ray.functions.bpe import bpe_encode_local, bpe_train_local
from goto_eater_crawler_ray.pipelines.queries import BPE_K

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def corpus(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text", "n_chars"])
    # keyed by sum(n_chars): the two gate corpora share a row COUNT, the
    # char total is the discriminating stat the SQL twin can compute
    return t.column("text").to_pylist(), sum(t.column("n_chars").to_pylist())


print("BPE_PINS = {")
for sf_dir in SF_DIRS:
    texts, key = corpus(sf_dir)
    merges = bpe_train_local(texts, BPE_K)
    print(f"    {key}: [  # {sf_dir}")
    for rank, (a, b, m, c) in enumerate(merges, 1):
        print(f"        ({rank}, {a!r}, {b!r}, {m!r}, {c}),")
    print("    ],")
print("}")

print("BPE_TOKEN_PINS = {")
for sf_dir in SF_DIRS:
    texts, key = corpus(sf_dir)
    counts = bpe_encode_local(texts, bpe_train_local(texts, BPE_K))
    print(f"    {key}: [  # {sf_dir}")
    for tok in sorted(counts):
        print(f"        ({tok!r}, {counts[tok]}),")
    print("    ],")
print("}")
