"""End-to-end crawl: seen-set equality, visit ordering, robots, resume.

SURVEY.md §5 'End-to-end' plan: run the full wave loop over the synthetic
corpus and assert
  * final URL-seen set == BFS closure ground truth (exact set equality),
  * per-host visit order respects the (depth, host-budget, discovery-time)
    heap: pagination chains strictly sequential, details after their list
    page,
  * robots-disallowed host never fetched,
  * determinism: a second engine run yields identical visit_seq assignment,
  * kill-after-wave-k resume produces the identical final state.
"""

import json
import os
import shutil

import pyarrow.dataset as pads
import pytest

from goto_eater_crawler_ray.pipelines.crawl import CrawlEngine, request_key
from goto_eater_crawler_ray.sources.pagestore import PageStore, ScaleSpec
from goto_eater_crawler_ray.state.canonical import canonicalize


@pytest.fixture(scope="module")
def crawl_out(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl"))
    eng = CrawlEngine(ScaleSpec.golden(), out, n_seen_shards=2, n_sched_shards=2, n_parts=4)
    totals = eng.run()
    # shutdown immediately: downstream tests read only (out, totals), and
    # leaked shard actors accumulate CPU reservations in the 4-CPU test
    # session until a later actor-pool stage deadlocks waiting for slots
    eng.shutdown()
    return out, totals


def _expected_keys(store):
    keys = set()
    for k in store.expected_reachable():
        method, url, form_enc = k.split("|", 2)
        canon = canonicalize(url)
        form = dict(p.split("=", 1) for p in form_enc.split("&")) if form_enc else {}
        keys.add(request_key(method, canon, form))
    return keys


def test_seen_set_equality(crawl_out):
    out, totals = crawl_out
    store = PageStore(ScaleSpec.golden())
    lineage = pads.dataset(os.path.join(out, "lineage")).to_table()
    got = set(lineage.column("url_key").to_pylist())
    expected = _expected_keys(store)
    assert got == expected, f"visited {len(got)} vs expected {len(expected)}; missing={len(expected - got)}, extra={len(got - expected)}"
    assert totals["pages"] == len(expected)


def test_robots_blocked_never_fetched(crawl_out):
    out, _ = crawl_out
    lineage = pads.dataset(os.path.join(out, "lineage")).to_table()
    hosts = set(lineage.column("host").to_pylist())
    assert "blocked.example.jp" not in hosts


def test_visit_order_invariants(crawl_out):
    out, _ = crawl_out
    lineage = pads.dataset(os.path.join(out, "lineage")).to_table().to_pandas()
    # (a) visit_seq is a dense 0..n-1 sequence per host
    for host, g in lineage.groupby("host"):
        seqs = sorted(g["visit_seq"].tolist())
        assert seqs == list(range(len(seqs))), f"{host}: non-dense visit_seq {seqs[:5]}..."
    # (b) pagination chains strictly increasing: page N+1 visited after N
    pag = lineage[lineage["host"] == "paginated0.example.jp"].copy()
    pag["page_no"] = pag["url"].str.extract(r"page=(\d+)").astype(int)
    pag = pag.sort_values("page_no")
    assert pag["visit_seq"].is_monotonic_increasing
    # (c) details visited after their list page (depth ordering within host)
    det = lineage[lineage["host"] == "listdetail0.example.jp"]
    lists = det[det["url"].str.contains("/list/")].set_index("url_key")["visit_seq"]
    parent_of = det.set_index("url_key")["parent_key"]
    for _, row in det[det["url"].str.contains("/detail/")].iterrows():
        parent_seq = lists.get(row["parent_key"])
        assert parent_seq is not None and row["visit_seq"] > parent_seq


def test_items_match_golden_totals(crawl_out):
    out, _ = crawl_out
    store = PageStore(ScaleSpec.golden())
    items = pads.dataset(os.path.join(out, "items")).to_table()
    # expected total: sum of expected items over the closure
    from tests.test_parse_golden import _crawl_closure

    exp_total = 0
    for pref, cb, url, method, form, meta in _crawl_closure(store):
        exp_items, _ = store.expected_parse(pref, cb, url, method, form)
        exp_total += len(exp_items)
    assert len(items) == exp_total
    # spot-check golden equality on one page's rows
    page_url = "http://paginated0.example.jp/list?page=2"
    exp_items, _ = store.expected_parse("paginated0", "parse", page_url)
    got = items.to_pandas()
    got = got[got["source_url"] == page_url].sort_values("row_in_page")
    assert len(got) == len(exp_items)
    for (_, g), e in zip(got.iterrows(), exp_items):
        for col in ("shop_name", "address", "tel", "genre_name", "zip_code"):
            assert g[col] == e[col] or (g[col] is None and e[col] is None)


def test_documents_span_invariant(crawl_out):
    out, _ = crawl_out
    store = PageStore(ScaleSpec.golden())
    docs = pads.dataset(os.path.join(out, "documents")).to_table().to_pandas().set_index("doc_id")
    page_url = "http://pagesynth.example.jp/p/1"
    _, exp_spans = store.expected_parse("pagesynth", "parse", page_url)
    got = docs.loc[page_url, "spans"]
    got_seq = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got]
    exp_seq = [(k, t, m, i) for i, (k, t, m) in enumerate(exp_spans)]
    assert got_seq == exp_seq


def test_metrics_totals(crawl_out):
    out, totals = crawl_out
    import pandas as pd

    m = pads.dataset(os.path.join(out, "metrics")).to_table().to_pandas()
    assert m["pages"].sum() == totals["pages"]
    assert (m.groupby("host")["pages"].sum() > 0).all()


def test_determinism_second_run(ray_session, crawl_out, tmp_path):
    out1, _ = crawl_out
    out2 = str(tmp_path / "crawl2")
    eng = CrawlEngine(ScaleSpec.golden(), out2, n_seen_shards=2, n_sched_shards=2, n_parts=4)
    eng.run()
    eng.shutdown()
    l1 = pads.dataset(os.path.join(out1, "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
    l2 = pads.dataset(os.path.join(out2, "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
    assert l1[["url_key", "visit_seq", "depth", "host"]].equals(l2[["url_key", "visit_seq", "depth", "host"]])


def test_resume_after_kill(ray_session, tmp_path):
    """Kill after wave 1, resume, final state equals an uninterrupted run.
    Uses chain_mode=False so the crawl spans many waves (chain mode
    collapses the golden corpus to ~1 wave)."""
    full_out = str(tmp_path / "full")
    eng0 = CrawlEngine(ScaleSpec.golden(), full_out, n_seen_shards=2, n_sched_shards=2, chain_mode=False)
    eng0.run()
    eng0.shutdown()

    part_out = str(tmp_path / "partial")
    eng = CrawlEngine(ScaleSpec.golden(), part_out, n_seen_shards=2, n_sched_shards=2, chain_mode=False, max_waves=2)
    eng.run()  # stops after wave 1 (simulated kill)
    assert eng._latest_checkpoint() == 1
    eng.shutdown()
    # resume to completion with a FRESH engine object
    eng2 = CrawlEngine(ScaleSpec.golden(), part_out, n_seen_shards=2, n_sched_shards=2, chain_mode=False)
    totals2 = eng2.run(resume=True)
    eng2.shutdown()

    l_full = pads.dataset(os.path.join(full_out, "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
    l_part = pads.dataset(os.path.join(part_out, "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
    assert len(l_full) == len(l_part)
    assert l_full[["url_key", "visit_seq", "depth"]].equals(l_part[["url_key", "visit_seq", "depth"]])


def test_distributed_admission_path_identical(ray_session, crawl_out, tmp_path):
    """driver_admit_max_pages=0 forces the distributed (dataset) admission
    path every wave; the frontier/lineage must be bit-identical to the
    driver fast path."""
    out1, _ = crawl_out
    out2 = str(tmp_path / "dist")
    eng = CrawlEngine(ScaleSpec.golden(), out2, n_seen_shards=2, n_sched_shards=2, n_parts=4, driver_admit_max_pages=0)
    eng.run()
    eng.shutdown()
    l1 = pads.dataset(os.path.join(out1, "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
    l2 = pads.dataset(os.path.join(out2, "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
    assert l1[["url_key", "visit_seq", "depth", "host"]].equals(l2[["url_key", "visit_seq", "depth", "host"]])


def test_fused_wave_equivalence(ray_session, crawl_out, tmp_path):
    """Fused-wave mode (fetch tasks persist the parsed store in-task and
    the admission chain streams in the SAME dataset execution — one
    pipeline startup per wave instead of two) must produce IDENTICAL
    lineage and parsed rows as the two-execution engine, in both the
    strict-wave and chain-following shapes.  The dedup exchange inside
    ``first_per_key`` is an all-to-all barrier, so admission still happens
    strictly after every fetch task of the wave completes — ordering
    semantics are unchanged, only the pipeline startup count drops."""
    runs = {}
    for tag, chain in (("w", False), ("c", True)):
        for mode, fused in (("std", False), ("fused", True)):
            out = str(tmp_path / f"{tag}_{mode}")
            eng = CrawlEngine(
                ScaleSpec.golden(), out, n_seen_shards=2, n_sched_shards=2, n_parts=4,
                driver_admit_max_pages=0, chain_mode=chain, fused_wave=fused,
            )
            eng.run()
            eng.shutdown()
            runs[(tag, mode)] = out
    for tag in ("w", "c"):
        l1 = pads.dataset(os.path.join(runs[(tag, "std")], "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
        l2 = pads.dataset(os.path.join(runs[(tag, "fused")], "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
        assert len(l1) == len(l2)
        assert l1[["url_key", "visit_seq", "depth", "host"]].equals(l2[["url_key", "visit_seq", "depth", "host"]])
        cols = ["url_key", "status", "depth", "n_links", "n_items", "bytes"]
        p1 = pads.dataset(os.path.join(runs[(tag, "std")], "parsed")).to_table(columns=cols).to_pandas().sort_values("url_key").reset_index(drop=True)
        p2 = pads.dataset(os.path.join(runs[(tag, "fused")], "parsed")).to_table(columns=cols).to_pandas().sort_values("url_key").reset_index(drop=True)
        assert p1.equals(p2)


def test_chain_vs_strict_wave_equivalence(ray_session, crawl_out, tmp_path):
    """The chain-following engine (default) must produce the IDENTICAL
    lineage (url_key, visit_seq, depth, host) as the strict-wave engine —
    same heap semantics, only the barrier moved."""
    out1, _ = crawl_out  # chain mode (default)
    out2 = str(tmp_path / "strict")
    eng_s = CrawlEngine(ScaleSpec.golden(), out2, n_seen_shards=2, n_sched_shards=2, n_parts=4, chain_mode=False)
    eng_s.run()
    eng_s.shutdown()
    l1 = pads.dataset(os.path.join(out1, "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
    l2 = pads.dataset(os.path.join(out2, "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
    assert len(l1) == len(l2)
    assert l1[["url_key", "visit_seq", "depth", "host"]].equals(l2[["url_key", "visit_seq", "depth", "host"]])


def test_engine_matches_reference_simulator(crawl_out):
    """THE ordering-parity assertion (SURVEY.md §5): the engine's final
    URL-seen set AND per-host visit order equal an independent plain-Python
    simulator implementing the reference's scheduling semantics (per-host
    serial + crawl delay + robots + (depth, budget, discovery) heap)."""
    import sys

    sys.path.insert(0, "tools")
    from tools.reference_simulator import simulate

    out, _ = crawl_out
    sim = simulate(PageStore(ScaleSpec.golden()))
    lineage = pads.dataset(os.path.join(out, "lineage")).to_table().to_pandas()
    got = {bytes(r["url_key"]): (r["host"], int(r["depth"]), int(r["visit_seq"])) for _, r in lineage.iterrows()}
    exp = {k: (v["host"], v["depth"], v["visit_seq"]) for k, v in sim.items()}
    assert set(got) == set(exp), f"seen-set mismatch: {len(set(got) ^ set(exp))} keys differ"
    mismatches = [(exp[k], got[k]) for k in exp if got[k] != exp[k]]
    assert not mismatches, f"{len(mismatches)} order mismatches, e.g. {mismatches[:3]}"


def test_terminal_failures_become_error_rows(ray_session, tmp_path):
    """Exhausted retries surface as status-503 rows with retry counts in
    metrics (SURVEY.md §2.5: error rows, not exceptions)."""
    out = str(tmp_path / "failcrawl")
    eng = CrawlEngine(ScaleSpec.golden(), out, n_seen_shards=2, n_sched_shards=2)
    # max_retries=0 in the fetch path: monkeypatch via spec with failures on
    import goto_eater_crawler_ray.pipelines.crawl as crawl_mod

    orig = crawl_mod.make_chain_fetch_fn
    crawl_mod.make_chain_fetch_fn = lambda *a, **k: orig(*a, **{**k, "max_retries": 0})
    try:
        eng.run()
    finally:
        crawl_mod.make_chain_fetch_fn = orig
        eng.shutdown()
    parsed = pads.dataset(os.path.join(out, "parsed")).to_table().to_pandas()
    errors = parsed[parsed["status"] != 200]
    assert len(errors) > 0, "golden spec plants retryable failures; with 0 retries some must fail"
    assert (errors["status"] == 503).all()
    assert (errors["bytes"] == 0).all()
    m = pads.dataset(os.path.join(out, "metrics")).to_table().to_pandas()
    assert m["errors"].sum() == len(errors)


def test_stateless_fetch_parse_stages(ray_session):
    """The two-stage stateless form (make_fetch_fn -> make_parse_emit) —
    the alternative to the fused chain worker for pre-scheduled frontiers
    (e.g. real-network actor pools wrap the same shape)."""
    import pyarrow as pa

    from goto_eater_crawler_ray.pipelines.crawl import make_fetch_fn, make_parse_emit
    from goto_eater_crawler_ray.schemas import FRONTIER_SCHEMA

    rows = []
    for p in (1, 2):
        rows.append(
            {
                "prefecture": "paginated0",
                "url": f"http://paginated0.example.jp/list?page={p}",
                "url_key": b"\x01" * 20,
                "host": "paginated0.example.jp",
                "part": 0,
                "depth": p - 1,
                "discovered_at": 0.0,
                "visit_seq": p - 1,
                "sched_ts": float(p),
                "method": "GET",
                "form_json": "",
                "meta_json": "",
                "callback": "parse",
                "parent_key": b"\x00" * 20,
                "chain": 0,
            }
        )
    batch = pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA)
    pages = make_fetch_fn(ScaleSpec.golden())(batch)
    parsed = make_parse_emit(7)(pages)
    assert parsed.column("wave").to_pylist() == [7, 7]
    assert all(n > 0 for n in [len(x) for x in parsed.column("items").to_pylist()])
    assert parsed.column("status").to_pylist() == [200, 200] or 503 in parsed.column("status").to_pylist()


def test_chain_host_with_history_consults_global_seen(ray_session):
    """Regression: a chain host WITH fetch history (lease.visit_count>1)
    must check discovered links against the GLOBAL seen set — a link to an
    already-fetched URL (back-link / earlier-wave page) must not re-fetch."""
    import json as _json

    import pyarrow as pa

    from goto_eater_crawler_ray.pipelines.crawl import make_chain_fetch_fn, request_key
    from goto_eater_crawler_ray.schemas import FRONTIER_SCHEMA
    from goto_eater_crawler_ray.state.politeness import PolitenessScheduler
    from goto_eater_crawler_ray.state.seen import SeenShard

    spec = ScaleSpec.golden()
    seen = [SeenShard(10_000) for _ in range(2)]
    sched = [PolitenessScheduler()]
    host = "paginated0.example.jp"
    # history: pages 1..4 already fetched in an earlier wave
    from goto_eater_crawler_ray.state.seen import ShardedSeenSet

    import numpy as np

    prior_keys = [request_key("GET", f"http://{host}/list?page={p}", {}) for p in (1, 2, 3, 4)]
    ShardedSeenSet(seen).admit(np.frombuffer(b"".join(prior_keys), dtype=np.uint8).reshape(-1, 20))
    sched[0].commit_hosts({host: {"visit_count": 4, "next_free_ts": 12.0}})

    row = {
        "prefecture": "paginated0",
        "url": f"http://{host}/list?page=3",
        "url_key": prior_keys[2],
        "host": host,
        "part": 0,
        "depth": 2,
        "discovered_at": 0.0,
        "visit_seq": 2,
        "sched_ts": 6.0,
        "method": "GET",
        "form_json": "",
        "meta_json": "",
        "callback": "parse",
        "parent_key": prior_keys[1],
        "chain": 1,
    }
    batch = pa.Table.from_pylist([row], schema=FRONTIER_SCHEMA)
    fn = make_chain_fetch_fn(spec, seen, sched, 1, wave=5)
    out = fn(batch)
    # page 3 discovers page 4 — already globally seen -> chain must stop at page 3
    assert out.column("url").to_pylist() == [f"http://{host}/list?page=3"]


def test_allowed_domains_scope_filter(ray_session):
    """Reference allowed_domains semantics (SURVEY §2.2): off-scope links
    are dropped at admission WITHOUT entering the seen set."""
    import pyarrow as pa

    from goto_eater_crawler_ray.pipelines.crawl import make_admit_fn
    from goto_eater_crawler_ray.state.seen import SeenShard

    shards = [SeenShard(1000)]
    fn = make_admit_fn(shards, 1, frozenset({"in.example.jp"}))
    batch = pa.Table.from_pylist(
        [
            {"url": "http://in.example.jp/a", "callback": "parse", "method": "GET", "form_json": "", "meta_json": "", "parent_url": "", "parent_key": b"\x00" * 20, "prefecture": "x", "depth": 1, "discovered_at": 0.0},
            {"url": "http://out.example.org/b", "callback": "parse", "method": "GET", "form_json": "", "meta_json": "", "parent_url": "", "parent_key": b"\x00" * 20, "prefecture": "x", "depth": 1, "discovered_at": 0.0},
        ]
    )
    out = fn(batch)
    assert out.column("host").to_pylist() == ["in.example.jp"]
    # the off-scope key never entered the seen set
    assert shards[0].size() == 1


def test_resume_with_checkpoint_interval(ray_session, tmp_path):
    """checkpoint_interval>1: resume restarts at the last CHECKPOINTED wave
    and deterministically REPLAYS the unchecked waves (idempotent parsed
    overwrites + no-op re-admissions) — final state equals an uninterrupted
    run."""
    full_out = str(tmp_path / "full")
    eng0 = CrawlEngine(ScaleSpec.golden(), full_out, n_seen_shards=2, n_sched_shards=2, chain_mode=False)
    eng0.run()
    eng0.shutdown()

    part_out = str(tmp_path / "partial")
    eng = CrawlEngine(ScaleSpec.golden(), part_out, n_seen_shards=2, n_sched_shards=2, chain_mode=False, checkpoint_interval=3, max_waves=4)
    eng.run()  # waves 0..3 executed; interval checkpoint at wave 2
    # simulate a kill AFTER wave 3 ran but BEFORE its checkpoint landed
    shutil.rmtree(os.path.join(part_out, "checkpoint", "wave=3"))
    assert eng._latest_checkpoint() == 2
    eng.shutdown()
    eng2 = CrawlEngine(ScaleSpec.golden(), part_out, n_seen_shards=2, n_sched_shards=2, chain_mode=False, checkpoint_interval=3)
    eng2.run(resume=True)  # replays wave 3, then continues to the end
    eng2.shutdown()

    l_full = pads.dataset(os.path.join(full_out, "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
    l_part = pads.dataset(os.path.join(part_out, "lineage")).to_table().to_pandas().sort_values("url_key").reset_index(drop=True)
    assert len(l_full) == len(l_part)
    assert l_full[["url_key", "visit_seq", "depth"]].equals(l_part[["url_key", "visit_seq", "depth"]])
