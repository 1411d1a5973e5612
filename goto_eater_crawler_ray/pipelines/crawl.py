"""The crawl engine: chain-following fetch over a wave-structured frontier.

Each wave is ONE fused Ray Dataset execution plus a (driver-side or
distributed) admission step:

    frontier_w (parquet, cost-balanced blocks)
      -> map_batches(chain_fetch)        # fused fetch+parse; bodies never
                                         # enter the object store
      -> write parsed/wave=w             # narrow nested table (items/spans/
                                         # pending links), idempotent rewrite
    pending links -> dedup -> seen-set admission -> politeness scheduling
      -> frontier_{w+1}                  # driver path when small, dataset
                                         # path (groupby co-location) when
                                         # large — bit-identical (tested)
    checkpoint every K waves: filter/clock shard blobs + atomic manifest
    finalize(): items / documents / lineage / metrics derived from the
      parsed store in concurrent one-pass executions (idempotent rewrite)

Chain-following (the scale-critical design): politeness is per-host SERIAL
(reference: goto_eat_scrapy/settings.py:34), so the task owning a host's
sole frontier row leases the host clock from its politeness shard, runs
the (depth, host-budget, discovery-time) priority heap locally for the
whole pagination chain, admits same-host links task-locally (bulk-
committed to the seen shards), and commits the clock back.  Lineage is
bit-identical to the strict-wave engine (chain_mode=False), which remains
for multi-wave semantics tests and cross-host fan-out.

Determinism at any parallelism level: within-wave dedup to the minimal
(discovered_at, parent_key, url) row before admission; one schedule call
per politeness shard per wave; visit_seq is a pure function of the crawl
graph, not task interleaving (e2e-tested at two admission paths and two
engine modes).

Scale notes (SURVEY.md §7.3-7.4): only the ~100 B/row pending-link control
plane ever shuffles; mega-hosts are pre-scheduled one-shot rows salted
across partitions while their politeness serializes in one shard; outputs
are per-wave parquet directories => resume skips completed waves.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from urllib.parse import urlencode, urljoin, urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import (
    DOCUMENT_SCHEMA,
    FRONTIER_SCHEMA,
    ITEM_STRUCT,
    LINEAGE_SCHEMA,
    LINK_STRUCT,
    PARSED_SCHEMA,
    SPAN_STRUCT,
)
from ..sources.pagestore import PageStore, ScaleSpec
from ..functions.overrides import apply_overrides
from ..stages.normalize import normalize_batch
from ..stages.parse import parse_page
from ..state.canonical import canonicalize
from ..state.politeness import PolitenessScheduler, robots_allowed
from ..state.seen import SeenShard, ShardedSeenSet, shard_of


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def request_key(method: str, canon_url: str, form: dict) -> bytes:
    """Request fingerprint = sha1(method|canonical|sorted form) — the
    Scrapy-fingerprint equivalent (SURVEY.md §2.2 URL dedup)."""
    payload = f"{method}|{canon_url}|{urlencode(sorted(form.items()))}"
    return hashlib.sha1(payload.encode("utf-8")).digest()


# ---------------------------------------------------------------------------
# stateless fetch with process-level store cache
# ---------------------------------------------------------------------------

_STORE_CACHE: dict[tuple, PageStore] = {}
_BROWSER_CACHE: dict[tuple, object] = {}


def _cached_store(spec: ScaleSpec) -> PageStore:
    key = tuple(sorted(spec.__dict__.items()))
    st = _STORE_CACHE.get(key)
    if st is None:
        st = _STORE_CACHE[key] = PageStore(spec)
    return st


def _cached_browser(spec: ScaleSpec):
    """Process-level browser instance (expensive init amortized like an
    actor pool — reference: oita playwright launch, SURVEY.md §2.5)."""
    from ..stages.fetch import SimBrowser

    key = tuple(sorted(spec.__dict__.items()))
    b = _BROWSER_CACHE.get(key)
    if b is None:
        b = _BROWSER_CACHE[key] = SimBrowser(spec)
    return b


_HTTP_FETCHER_CACHE: dict[tuple, object] = {}


def _cached_http_fetcher(http_opts: dict):
    """Process-level real-network fetcher (requests.Session + per-host
    wall clocks built once per worker process; all tasks in the process
    share the host pacing state, which only strengthens politeness)."""
    from ..stages.fetch import HttpFetcher

    key = tuple(sorted(http_opts.items()))
    f = _HTTP_FETCHER_CACHE.get(key)
    if f is None:
        f = _HTTP_FETCHER_CACHE[key] = HttpFetcher(**http_opts)
    return f


def make_fetch_fn(spec: ScaleSpec, max_retries: int = 8):
    from ..stages.fetch import fetch_simulated

    def fetch_batch(batch: pa.Table) -> pa.Table:
        store = _cached_store(spec)
        urls = batch.column("url").to_pylist()
        methods = batch.column("method").to_pylist()
        forms = batch.column("form_json").to_pylist()
        scheds = batch.column("sched_ts").to_pylist()
        metas = batch.column("meta_json").to_pylist() if "meta_json" in batch.column_names else [""] * len(urls)
        n = len(urls)
        status, ctype, body, latency, attempts, fetched_at = (
            [0] * n,
            [""] * n,
            [b""] * n,
            [0] * n,
            [0] * n,
            [0.0] * n,
        )
        for i in range(n):
            form = json.loads(forms[i]) if forms[i] else {}
            meta = json.loads(metas[i]) if metas[i] else {}
            status[i], ctype[i], body[i], latency[i], attempts[i], fetched_at[i] = fetch_simulated(
                store, urls[i], methods[i], form, scheds[i], meta, browser_factory=lambda: _cached_browser(spec), max_retries=max_retries
            )
        return (
            batch.append_column("status", pa.array(status, pa.int32()))
            .append_column("content_type", pa.array(ctype, pa.string()))
            .append_column("body", pa.array(body, pa.binary()))
            .append_column("latency_ms", pa.array(latency, pa.int32()))
            .append_column("attempts", pa.array(attempts, pa.int32()))
            .append_column("fetched_at", pa.array(fetched_at, pa.float64()))
        )

    return fetch_batch


# ---------------------------------------------------------------------------
# parse + emit (body dropped)
# ---------------------------------------------------------------------------


def make_parse_emit(wave: int):
    """Parse stage bound to its wave id (wave lands in the parsed table so
    lineage/metrics can be derived without per-wave bookkeeping)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = parse_emit_batch(batch)
        return t.append_column("wave", pa.array([wave] * len(t), pa.int32()))

    return fn


CHAIN_EPS = 1e-6


def make_chain_fetch_fn(spec: ScaleSpec, seen_shards: list, sched_actors: list, n_sched_shards: int, wave: int, max_retries: int = 8, registry=None, fetch_kind: str = "simulated", http_opts: dict | None = None, derived_root: str | None = None, parsed_root: str | None = None):
    """Chain-following fetch+parse stage (the scale-critical design move).

    Politeness is per-host SERIAL (reference settings.py:34), so a host's
    pagination chain can never parallelize — a global wave barrier per
    chain hop only buys scheduling overhead.  Instead, the ONE task that
    holds a host's sole frontier row this wave (``chain`` flag):

      1. leases the host's clock + robots from its politeness shard
         (one RPC per shard per task),
      2. runs the per-host priority heap (depth, host-budget at admission,
         discovery-time — the north-rule heap) LOCALLY, fetching/parsing
         the whole chain serially,
      3. admits same-host discovered links through the seen-set shard
         actors (batched per page; global first-discovery-wins still
         holds), marking them ``followed``,
      4. commits the advanced clock back (one RPC per shard per task).

    Cross-host links and multi-seed (mega) hosts keep the wave path:
    mega-host rows are pre-scheduled at admission and fetched one-shot in
    parallel here.  Visit order is bit-identical to the strict-wave
    engine (pytest-compared) — the heap semantics are the same, only the
    barrier moved.
    """
    import heapq

    from ..stages.fetch import fetch_simulated
    from ..stages.parse import ParseResult

    def fn(batch: pa.Table) -> pa.Table:
        import gc

        gc.disable()  # allocation-heavy loop; re-enabled in the finally below
        prof_dir = os.environ.get("CRAWL_TASK_PROF", "")
        t0 = time.perf_counter() if prof_dir else 0.0
        try:
            out = _fn_body(batch)
        finally:
            gc.enable()
        if prof_dir:  # per-task wall profile (scaling attribution tool)
            try:
                with open(os.path.join(prof_dir, f"{os.getpid()}.jsonl"), "a") as f:
                    f.write(json.dumps({"rows_in": batch.num_rows, "rows_out": len(out), "sec": round(time.perf_counter() - t0, 4)}) + "\n")
            except OSError:
                pass  # profiling must never break the pipeline (dir may be gone)
        return out

    def _fn_body(batch: pa.Table) -> pa.Table:
        import ray

        store = _cached_store(spec)
        seen = ShardedSeenSet(seen_shards)
        rows = batch.to_pylist()
        # flat columnar accumulators: building nested rows as per-row lists
        # of dicts costs ~100M tiny allocations per bench run; flat python
        # lists + one ListArray.from_arrays at the end is several x cheaper
        ITEM_FIELDS = [f.name for f in ITEM_STRUCT]
        scalar = {k: [] for k in ("doc_id", "prefecture", "url", "url_key", "parent_key", "host", "part", "depth", "visit_seq", "sched_ts", "fetched_at", "status", "attempts", "bytes", "callback", "n_links", "n_items")}
        item_flat = {f: [] for f in ITEM_FIELDS}
        item_counts: list[int] = []
        span_kind: list[str] = []
        span_text: list[str] = []
        span_ref: list[str] = []
        span_counts: list[int] = []
        link_flat = {k: [] for k in ("url", "callback", "method", "form_json", "meta_json")}
        link_counts: list[int] = []

        def fetch_one(url, method, form_json, sched_ts, meta_json=""):
            form = json.loads(form_json) if form_json else {}
            meta = json.loads(meta_json) if meta_json else {}
            if fetch_kind == "http":  # real network (requests), same contract
                status, _ctype, body, _lat, att, fetched_at = _cached_http_fetcher(http_opts or {}).fetch(
                    url, method, form, sched_ts, meta
                )
            else:
                status, _ctype, body, _lat, att, fetched_at = fetch_simulated(
                    store, url, method, form, sched_ts, meta, browser_factory=lambda: _cached_browser(spec), max_retries=max_retries
                )
            return status, att, body, fetched_at, form

        def emit(row, status, att, body, res, fetched_at, followed_mask):
            form = json.loads(row["form_json"]) if row["form_json"] else {}
            doc_id = row["url"] if row["method"] == "GET" else f"{row['url']}#{urlencode(sorted(form.items()))}"
            s = scalar
            s["doc_id"].append(doc_id)
            s["prefecture"].append(row["prefecture"])
            s["url"].append(row["url"])
            s["url_key"].append(row["url_key"])
            s["parent_key"].append(row["parent_key"])
            s["host"].append(row["host"])
            s["part"].append(row["part"])
            s["depth"].append(row["depth"])
            s["visit_seq"].append(row["visit_seq"])
            s["sched_ts"].append(row["sched_ts"])
            s["fetched_at"].append(fetched_at)
            s["status"].append(status)
            s["attempts"].append(att)
            s["bytes"].append(len(body))
            s["callback"].append(row["callback"])
            s["n_links"].append(len(res.links))
            s["n_items"].append(len(res.items))
            for it in res.items:
                for f in ITEM_FIELDS:
                    item_flat[f].append(it[f])
            item_counts.append(len(res.items))
            for k, t_, m in res.spans:
                span_kind.append(k)
                span_text.append(t_)
                span_ref.append(m)
            span_counts.append(len(res.spans))
            nl = 0
            for lk, fol in zip(res.links, followed_mask):
                if fol:
                    continue
                link_flat["url"].append(lk["url"])
                link_flat["callback"].append(lk["callback"])
                link_flat["method"].append(lk["method"])
                link_flat["form_json"].append(json.dumps(lk["form"], sort_keys=True) if lk["form"] else "")
                link_flat["meta_json"].append(json.dumps(lk["meta"], sort_keys=True) if lk["meta"] else "")
                nl += 1
            link_counts.append(nl)

        def parse_of(row, status, body):
            if status != 200:
                return ParseResult()
            meta = json.loads(row["meta_json"]) if row["meta_json"] else {}
            if registry is not None:
                return registry.parse(row["prefecture"], row["callback"], row["url"], body, meta, row["depth"])
            return parse_page(row["prefecture"], row["callback"], row["url"], body, meta, row["depth"])

        chain_rows = [r for r in rows if r.get("chain")]
        oneshot_rows = [r for r in rows if not r.get("chain")]

        # --- one-shot rows (pre-scheduled at admission) -----------------
        for r in oneshot_rows:
            status, att, body, fetched_at, _ = fetch_one(r["url"], r["method"], r["form_json"], r["sched_ts"], r["meta_json"])
            res = parse_of(r, status, body)
            emit(r, status, att, body, res, fetched_at, [False] * len(res.links))

        # --- chain rows: lease -> local heap -> commit ------------------
        if chain_rows:
            shard_hosts: dict[int, list[str]] = {}
            for r in chain_rows:
                shard_hosts.setdefault(_h64(r["host"]) % n_sched_shards, []).append(r["host"])
            leases: dict[str, dict] = {}
            if hasattr(sched_actors[0].lease_hosts, "remote"):
                for d in ray.get([sched_actors[s].lease_hosts.remote(hs) for s, hs in shard_hosts.items()]):
                    leases.update(d)
            else:
                for s, hs in shard_hosts.items():
                    leases.update(sched_actors[s].lease_hosts(hs))

            commits: dict[int, dict] = {}
            admitted_keys: list[bytes] = []  # bulk-recorded in the seen shards at task end
            for r in chain_rows:
                host = r["host"]
                lease = leases[host]
                clock, seq, delay = lease["next_free_ts"], lease["visit_count"], lease["crawl_delay"]
                disallow = lease["rules"]
                # Same-host links are discoverable ONLY from this host's own
                # pages and this task owns the host exclusively this wave, so
                # admission is task-local for a FRESH host (visit_count==1:
                # nothing but this seed was ever scheduled) — keys are
                # bulk-recorded in the seen shards at task end. A host WITH
                # fetch history (later-wave continuation) must consult the
                # global shards per page, or a back-link to an earlier-wave
                # URL would be silently re-fetched.
                local_seen: set[bytes] = {r["url_key"]}
                host_has_history = lease["visit_count"] > 1
                tie = 0
                # the seed row was scheduled at admission; fetch it as-is
                heap = [(-1, -1.0, r["discovered_at"], tie, r, True)]
                while heap:
                    _, _, _, _, row, pre_scheduled = heapq.heappop(heap)
                    if not pre_scheduled:
                        row = dict(row)
                        row["visit_seq"] = seq
                        row["sched_ts"] = clock
                        seq += 1
                        clock += delay
                    status, att, body, fetched_at, _ = fetch_one(row["url"], row["method"], row["form_json"], row["sched_ts"], row["meta_json"])
                    res = parse_of(row, status, body)
                    followed = [False] * len(res.links)
                    # admit same-host children as one batch
                    cand = []
                    for i, lk in enumerate(res.links):
                        canon = canonicalize(lk["url"], base=row["url"])
                        h = urlsplit(canon).netloc
                        if h == host:
                            key = request_key(lk["method"], canon, lk["form"])
                            cand.append((i, lk, canon, key))
                    if cand:
                        if host_has_history:
                            fresh = [c for c in cand if c[3] not in local_seen]
                            if fresh:
                                novel_mask = seen.admit(np.frombuffer(b"".join(k for *_, k in fresh), dtype=np.uint8).reshape(-1, 20))
                                globally_new = {c[3] for c, nv in zip(fresh, novel_mask) if nv}
                            else:
                                globally_new = set()
                        for i, lk, canon, key in cand:
                            if host_has_history:
                                is_new = key in globally_new and key not in local_seen
                                if is_new:
                                    local_seen.add(key)  # already recorded globally
                            else:
                                is_new = key not in local_seen
                                if is_new:
                                    local_seen.add(key)
                                    admitted_keys.append(key)
                            if not is_new:
                                followed[i] = True  # someone (us) already has it
                                continue
                            path = urlsplit(canon).path or "/"
                            if not robots_allowed(path, disallow):
                                followed[i] = True  # admitted but robots-gated: never fetched
                                continue
                            followed[i] = True
                            tie += 1
                            child = {
                                "prefecture": row["prefecture"],
                                "url": canon,
                                "url_key": key,
                                "host": host,
                                "part": row["part"],
                                "depth": row["depth"] + 1,
                                "discovered_at": fetched_at + i * CHAIN_EPS,
                                "visit_seq": -1,
                                "sched_ts": -1.0,
                                "method": lk["method"],
                                "form_json": json.dumps(lk["form"], sort_keys=True) if lk["form"] else "",
                                "meta_json": json.dumps(lk["meta"], sort_keys=True) if lk["meta"] else "",
                                "callback": lk["callback"],
                                "parent_key": row["url_key"],
                                "chain": 1,
                            }
                            # north-rule heap key: (depth, budget at admission, disc)
                            heapq.heappush(heap, (child["depth"], clock, child["discovered_at"], tie, child, False))
                    emit(row, status, att, body, res, fetched_at, followed)
                commits.setdefault(_h64(host) % n_sched_shards, {})[host] = {"visit_count": seq, "next_free_ts": clock}
            if admitted_keys:
                seen.admit(np.frombuffer(b"".join(admitted_keys), dtype=np.uint8).reshape(-1, 20))
            if commits:
                if hasattr(sched_actors[0].commit_hosts, "remote"):
                    ray.get([sched_actors[s].commit_hosts.remote(upd) for s, upd in commits.items()])
                else:
                    for s, upd in commits.items():
                        sched_actors[s].commit_hosts(upd)
        def list_of_struct(counts, struct_type, arrays):
            offsets = pa.array(np.concatenate(([0], np.cumsum(counts))).astype(np.int32))
            return pa.ListArray.from_arrays(offsets, pa.StructArray.from_arrays(arrays, fields=list(struct_type)))

        span_off = (
            np.concatenate([np.arange(c, dtype=np.int32) for c in span_counts])
            if span_counts and sum(span_counts)
            else np.array([], np.int32)
        )
        cols = []
        for field in PARSED_SCHEMA:
            if field.name == "items":
                cols.append(list_of_struct(item_counts, ITEM_STRUCT, [pa.array(item_flat[f.name], f.type) for f in ITEM_STRUCT]))
            elif field.name == "spans":
                cols.append(
                    list_of_struct(
                        span_counts,
                        SPAN_STRUCT,
                        [pa.array(span_kind, pa.string()), pa.array(span_text, pa.string()), pa.array(span_ref, pa.string()), pa.array(span_off, pa.int32())],
                    )
                )
            elif field.name == "links":
                cols.append(list_of_struct(link_counts, LINK_STRUCT, [pa.array(link_flat[f.name], pa.string()) for f in LINK_STRUCT]))
            else:
                cols.append(pa.array(scalar[field.name], field.type))
        tbl = pa.Table.from_arrays(cols, schema=PARSED_SCHEMA)
        tbl = tbl.append_column("wave", pa.array([wave] * len(tbl), pa.int32()))
        if derived_root is not None and len(tbl):
            _write_derived(tbl, derived_root, wave)
        if parsed_root is not None:
            # fused-wave mode: persist the parsed store from the fetch task
            # itself (same deterministic-fingerprint idempotency as the
            # derived stores) and hand ONLY the link columns downstream —
            # the admission chain runs in the SAME dataset execution, so a
            # wave costs one pipeline startup instead of two
            if len(tbl):
                _write_parsed(tbl, parsed_root, wave)
            return tbl.select(["links", "url", "url_key", "prefecture", "depth", "fetched_at"])
        return tbl

    return fn


def _write_derived(tbl: pa.Table, root: str, wave: int) -> None:
    """Write a fetch batch's derived projections (items / documents /
    lineage) DIRECTLY from the fetch task: the batch is already decoded in
    memory here, so each derived store costs one encode and ZERO re-reads
    of the nested parsed store (finalize only aggregates flat metrics
    columns — measured 2x end-to-end finalize win on the bench corpus,
    and at 100 TB the full-corpus nested re-read never happens at all).

    Layout: one file per fetch batch under ``{store}/w{wave}/`` ("w" not
    "wave=": key=value dirs would hive-partition a second ``wave`` column
    onto readers).  Idempotency: file names are a deterministic batch
    fingerprint (first/last url_key + row count), so a RETRIED task
    overwrites its own files instead of appending duplicates, and a
    re-run wave starts from a dir `_run_wave` rmtree'd."""
    import hashlib

    import pyarrow.parquet as pq

    keys = tbl.column("url_key")
    tag = hashlib.md5(keys[0].as_py() + keys[len(tbl) - 1].as_py() + len(tbl).to_bytes(4, "big")).hexdigest()[:16]
    for sub, derive in (("items", explode_items), ("documents", explode_documents), ("lineage", lineage_batch)):
        d = os.path.join(root, sub, f"w{wave}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(derive(tbl), os.path.join(d, f"b-{tag}.parquet"))


def _write_parsed(tbl: pa.Table, root: str, wave: int) -> None:
    """Fused-wave in-task parsed-store write: same layout the standard
    path's ``write_parquet`` produces (``parsed/wave={w}``), same
    deterministic-fingerprint file naming as :func:`_write_derived` so a
    retried fetch task overwrites its own file instead of duplicating."""
    import hashlib

    import pyarrow.parquet as pq

    keys = tbl.column("url_key")
    tag = hashlib.md5(keys[0].as_py() + keys[len(tbl) - 1].as_py() + len(tbl).to_bytes(4, "big")).hexdigest()[:16]
    d = os.path.join(root, "parsed", f"wave={wave}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, os.path.join(d, f"b-{tag}.parquet"))


def parse_emit_batch(batch: pa.Table) -> pa.Table:
    """Page rows -> PARSED_SCHEMA rows (items/spans/links nested; no body)."""
    out = {name: [] for name in PARSED_SCHEMA.names}
    cols = {n: batch.column(n).to_pylist() for n in ("prefecture", "url", "url_key", "parent_key", "host", "part", "depth", "visit_seq", "sched_ts", "fetched_at", "status", "attempts", "callback", "meta_json", "body", "form_json", "method")}
    n = len(batch)
    for i in range(n):
        status = cols["status"][i]
        body = cols["body"][i] or b""
        meta = json.loads(cols["meta_json"][i]) if cols["meta_json"][i] else {}
        if status == 200:
            res = parse_page(cols["prefecture"][i], cols["callback"][i], cols["url"][i], body, meta, cols["depth"][i])
        else:
            from ..stages.parse import ParseResult

            res = ParseResult()
        form = json.loads(cols["form_json"][i]) if cols["form_json"][i] else {}
        doc_id = cols["url"][i] if cols["method"][i] == "GET" else f"{cols['url'][i]}#{urlencode(sorted(form.items()))}"
        out["doc_id"].append(doc_id)
        out["prefecture"].append(cols["prefecture"][i])
        out["url"].append(cols["url"][i])
        out["url_key"].append(cols["url_key"][i])
        out["parent_key"].append(cols["parent_key"][i])
        out["host"].append(cols["host"][i])
        out["part"].append(cols["part"][i])
        out["depth"].append(cols["depth"][i])
        out["visit_seq"].append(cols["visit_seq"][i])
        out["sched_ts"].append(cols["sched_ts"][i])
        out["fetched_at"].append(cols["fetched_at"][i])
        out["status"].append(status)
        out["attempts"].append(cols["attempts"][i])
        out["bytes"].append(len(body))
        out["callback"].append(cols["callback"][i])
        out["items"].append(res.items)
        out["n_items"].append(len(res.items))
        out["spans"].append([{"kind": k, "text": t, "media_ref": m, "offset": j} for j, (k, t, m) in enumerate(res.spans)])
        out["n_links"].append(len(res.links))
        out["links"].append(
            [
                {
                    "url": lk["url"],
                    "callback": lk["callback"],
                    "method": lk["method"],
                    "form_json": json.dumps(lk["form"], sort_keys=True) if lk["form"] else "",
                    "meta_json": json.dumps(lk["meta"], sort_keys=True) if lk["meta"] else "",
                }
                for lk in res.links
            ]
        )
    return pa.Table.from_pydict(out, schema=PARSED_SCHEMA)


# --- vectorized exploders ---------------------------------------------------


def explode_items(batch: pa.Table) -> pa.Table:
    """list<struct> items -> flat normalized item rows (zero Python loop)."""
    items_col = batch.column("items").combine_chunks()
    flat = pc.list_flatten(items_col)
    parents = pc.list_parent_indices(items_col)
    row_in_page = np.concatenate([np.arange(n, dtype=np.int32) for n in pc.list_value_length(items_col).fill_null(0).to_numpy(zero_copy_only=False)]) if len(flat) else np.array([], dtype=np.int32)
    tbl = pa.table(
        {f.name: flat.field(f.name) for f in ITEM_STRUCT}
        | {
            "prefecture": pc.take(batch.column("prefecture"), parents),
            "source_url": pc.take(batch.column("url"), parents),
            "row_in_page": pa.array(row_in_page, pa.int32()),
            "visit_seq": pc.take(batch.column("visit_seq"), parents),
        }
    )
    # special-case rule table BEFORE normalize (reference fixes happen in
    # parse, ahead of the pipeline normalize — SURVEY §2.3)
    return normalize_batch(apply_overrides(tbl))


def explode_documents(batch: pa.Table) -> pa.Table:
    return batch.select(["doc_id", "spans"]).cast(DOCUMENT_SCHEMA)


def lineage_batch(batch: pa.Table) -> pa.Table:
    return batch.select(["url_key", "url", "parent_key", "prefecture", "depth", "wave", "visit_seq", "host"]).cast(LINEAGE_SCHEMA)


def metrics_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregation (combiner) — the groupby downstream
    only shuffles one row per (wave, host, batch), not per page."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "wave": batch.column("wave").to_numpy(zero_copy_only=False),
            "host": batch.column("host").to_pylist(),
            "pages": 1,
            "items": batch.column("n_items").to_numpy(zero_copy_only=False),
            "links": batch.column("n_links").to_numpy(zero_copy_only=False),
            "bytes": batch.column("bytes").to_numpy(zero_copy_only=False),
            "errors": pc.not_equal(batch.column("status"), 200).to_numpy(zero_copy_only=False).astype(np.int64),
            "retries": pc.subtract(batch.column("attempts"), 1).to_numpy(zero_copy_only=False),
        }
    )
    return pa.Table.from_pandas(df.groupby(["wave", "host"], as_index=False).sum(), preserve_index=False)


def explode_links(batch: pa.Table) -> pa.Table:
    """Parsed pages -> flat discovered-link rows with parent context.

    Virtual discovery time = parent fetched_at + in-page link index *
    epsilon: preserves in-page discovery order (pagination chains are
    sequential by construction, SURVEY.md §2.2)."""
    links_col = batch.column("links").combine_chunks()
    flat = pc.list_flatten(links_col)
    if len(flat) == 0:
        return pa.Table.from_pydict(
            {n: [] for n in ("url", "callback", "method", "form_json", "meta_json", "parent_url", "parent_key", "prefecture", "depth", "discovered_at")},
            schema=pa.schema(
                [
                    ("url", pa.string()),
                    ("callback", pa.string()),
                    ("method", pa.string()),
                    ("form_json", pa.string()),
                    ("meta_json", pa.string()),
                    ("parent_url", pa.string()),
                    ("parent_key", pa.binary(20)),
                    ("prefecture", pa.string()),
                    ("depth", pa.int32()),
                    ("discovered_at", pa.float64()),
                ]
            ),
        )
    parents = pc.list_parent_indices(links_col)
    lengths = pc.list_value_length(links_col).fill_null(0).to_numpy(zero_copy_only=False)
    link_idx = np.concatenate([np.arange(n) for n in lengths if n is not None]) if lengths.sum() else np.array([])
    disc = pc.take(batch.column("fetched_at"), parents).to_numpy(zero_copy_only=False) + link_idx * 1e-6
    tbl = pa.table(
        {
            "url": flat.field("url"),
            "callback": flat.field("callback"),
            "method": flat.field("method"),
            "form_json": flat.field("form_json"),
            "meta_json": flat.field("meta_json"),
            "parent_url": pc.take(batch.column("url"), parents),
            "parent_key": pc.take(batch.column("url_key"), parents),
            "prefecture": pc.take(batch.column("prefecture"), parents),
            "depth": pc.cast(pc.add(pc.take(batch.column("depth"), parents), 1), pa.int32()),
            "discovered_at": pa.array(disc, pa.float64()),
        }
    )
    return tbl


# ---------------------------------------------------------------------------
# admission + scheduling
# ---------------------------------------------------------------------------


def make_admit_fn(seen_shards: list, n_sched_shards: int, allowed_hosts: frozenset[str] | None = None):
    """Canonicalize + fingerprint + domain-scope gate + seen-set admission.

    ``allowed_hosts`` reproduces the reference's ``allowed_domains``
    per-spider scope filter (SURVEY.md §2.2: every spider declares one) as
    a frontier-admission predicate: off-scope links are dropped BEFORE the
    seen set, so they can still be admitted later by an in-scope discovery.

    Input: exploded link rows (post within-wave dedup). Output: admitted
    rows + host/sched_shard columns, NOT yet scheduled."""

    def admit(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _empty_admitted()
        urls = batch.column("url").to_pylist()
        bases = batch.column("parent_url").to_pylist()
        methods = batch.column("method").to_pylist()
        forms = batch.column("form_json").to_pylist()
        canon, keys, hosts = [], [], []
        for u, b, m, f in zip(urls, bases, methods, forms):
            c = canonicalize(u, base=b or None)
            canon.append(c)
            keys.append(request_key(m, c, json.loads(f) if f else {}))
            hosts.append(urlsplit(c).netloc)
        in_scope = np.ones(len(canon), dtype=bool) if allowed_hosts is None else np.array([h in allowed_hosts for h in hosts])
        key_arr = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, 20)
        novel = np.zeros(len(canon), dtype=bool)
        if in_scope.any():
            novel[in_scope] = ShardedSeenSet(seen_shards).admit(key_arr[in_scope])
        mask = pa.array(novel)
        kept = batch.filter(mask)
        idx = np.flatnonzero(novel)
        return (
            kept.append_column("canon_url", pa.array([canon[i] for i in idx], pa.string()))
            .append_column("url_key", pa.array([keys[i] for i in idx], pa.binary(20)))
            .append_column("host", pa.array([hosts[i] for i in idx], pa.string()))
            .append_column(
                "sched_shard",
                pa.array([_h64(hosts[i]) % n_sched_shards for i in idx], pa.int32()),
            )
        )

    return admit


def _empty_admitted() -> pa.Table:
    return pa.Table.from_pydict(
        {n: [] for n in ("url", "callback", "method", "form_json", "meta_json", "parent_url", "parent_key", "prefecture", "depth", "discovered_at", "canon_url", "url_key", "host", "sched_shard")},
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("callback", pa.string()),
                ("method", pa.string()),
                ("form_json", pa.string()),
                ("meta_json", pa.string()),
                ("parent_url", pa.string()),
                ("parent_key", pa.binary(20)),
                ("prefecture", pa.string()),
                ("depth", pa.int32()),
                ("discovered_at", pa.float64()),
                ("canon_url", pa.string()),
                ("url_key", pa.binary(20)),
                ("host", pa.string()),
                ("sched_shard", pa.int32()),
            ]
        ),
    )


def make_schedule_fn(sched_actors: list, n_parts: int, mega_hosts: frozenset[str], chain_mode: bool = False):
    """One map_groups call per politeness shard: assigns (visit_seq,
    sched_ts), applies robots gate, computes the salted output partition
    (mega-hosts spread by url_key, politeness still per-host serialized —
    SURVEY.md §7.4).

    With ``chain_mode`` the per-host chain flag is set HERE, group-locally:
    hosts are hash-routed to exactly one sched_shard, so a host's frontier
    rows are always all in this group and a group-local count equals the
    wave-global count.  Setting it here (not on the driver-merged frame)
    keeps chain-following alive on the distributed phase-B path too —
    otherwise the scale-critical optimization would silently turn off for
    any wave larger than driver_admit_max_pages."""
    import ray

    def schedule_group(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame()
        shard = int(df["sched_shard"].iloc[0])
        hosts = df["host"].tolist()
        paths = [urlsplit(u).path or "/" for u in df["canon_url"].tolist()]
        depths = df["depth"].to_numpy()
        disc = df["discovered_at"].to_numpy()
        actor = sched_actors[shard]
        if hasattr(actor.schedule, "remote"):
            out = ray.get(actor.schedule.remote(hosts, paths, depths, disc))
        else:
            out = actor.schedule(hosts, paths, depths, disc)
        df = df.assign(visit_seq=out["visit_seq"], sched_ts=out["sched_ts"])
        df = df[out["allowed"] & (df["visit_seq"] >= 0)]
        parts = [
            (_h64(k.hex()) if h in mega_hosts else _h64(h)) % n_parts
            for h, k in zip(df["host"], df["url_key"])
        ]
        df = df.assign(part=np.array(parts, dtype=np.int32))
        if chain_mode and len(df):
            counts = df["host"].value_counts()
            df = df.assign(chain=df["host"].map(counts).eq(1).astype("int8"))
        return df

    return schedule_group


def to_frontier_table(df_batch) -> pa.Table:
    """Scheduled pandas rows -> FRONTIER_SCHEMA arrow table."""
    import pandas as pd

    if len(df_batch) == 0:
        return FRONTIER_SCHEMA.empty_table()
    if "chain" not in df_batch.columns:
        df_batch = df_batch.assign(chain=np.int8(0))
    # pseudo-random row order (stable sort on the hash key) -> cost-balanced
    # blocks: without this, expensive chain hosts cluster at the front of
    # the frontier and the last blocks (cheap one-shots) finish early
    df_batch = df_batch.sort_values("url_key", kind="stable")
    return pa.Table.from_pydict(
        {
            "prefecture": df_batch["prefecture"].tolist(),
            "url": df_batch["canon_url"].tolist(),
            "url_key": df_batch["url_key"].tolist(),
            "host": df_batch["host"].tolist(),
            "part": df_batch["part"].to_numpy(dtype=np.int32),
            "depth": df_batch["depth"].to_numpy(dtype=np.int32),
            "discovered_at": df_batch["discovered_at"].to_numpy(),
            "visit_seq": df_batch["visit_seq"].to_numpy(dtype=np.int64),
            "sched_ts": df_batch["sched_ts"].to_numpy(),
            "method": df_batch["method"].tolist(),
            "form_json": df_batch["form_json"].tolist(),
            "meta_json": df_batch["meta_json"].tolist(),
            "callback": df_batch["callback"].tolist(),
            "parent_key": df_batch["parent_key"].tolist(),
            "chain": df_batch["chain"].to_numpy(dtype=np.int8),
        },
        schema=FRONTIER_SCHEMA,
    )


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------


class CrawlEngine:
    """Driver-side wave loop with checkpoint/resume.

    Seen/politeness shards are ALWAYS Ray actors: the wave pipeline runs
    distributed, and shard state must be shared+mutable across tasks
    (plain objects captured in a task closure deserialize as read-only
    copies — observed failure mode, not a theory)."""

    def __init__(
        self,
        spec: ScaleSpec,
        out_dir: str,
        n_seen_shards: int = 4,
        n_sched_shards: int = 2,
        n_parts: int = 8,
        seen_capacity: int = 1_000_000,
        fetch_batch_size: int | None = None,  # None -> width-aware auto-size per wave
        max_waves: int = 10_000,
        checkpoint_interval: int = 1,
        driver_admit_max_pages: int = 20_000,
        chain_mode: bool = True,
        fused_wave: bool = False,
        registry=None,
        fetch_kind: str = "simulated",
        http_opts: dict | None = None,
        seeds: list[dict] | None = None,
        politeness: list[dict] | None = None,
    ):
        self.spec = spec
        self.out_dir = out_dir
        self.n_seen_shards = n_seen_shards
        self.n_sched_shards = n_sched_shards
        self.n_parts = n_parts
        self.seen_capacity = seen_capacity
        self.fetch_batch_size = fetch_batch_size
        self.max_waves = max_waves
        self.checkpoint_interval = max(1, checkpoint_interval)
        self.driver_admit_max_pages = driver_admit_max_pages
        self.chain_mode = chain_mode
        # fused-wave mode: fetch tasks persist the parsed store themselves
        # and the admission chain runs in the SAME dataset execution (one
        # pipeline startup per wave instead of two — the per-wave fixed
        # cost is the dominant term of a deep many-wave crawl).  Requires
        # distributed admission (driver_admit_max_pages=0): the driver
        # path needs the page count before choosing, which a fused
        # pipeline can't know mid-stream.
        self.fused_wave = fused_wave and driver_admit_max_pages == 0
        self.registry = registry  # ParserSpec registry (None -> module PARSERS)
        self.debug_timing = os.environ.get("CRAWL_DEBUG_TIMING", "") == "1"
        self.store = PageStore(spec)
        # fetch seam: "simulated" (deterministic corpus) or "http" (real
        # network via requests — seeds/politeness overrides point the
        # engine at real hosts; everything else is shared machinery)
        self.fetch_kind = fetch_kind
        self.http_opts = dict(http_opts or {})
        self._seeds_override = seeds
        self._politeness_override = politeness
        self._live_robots: dict[str, str] | None = None  # http-kind per-host robots cache
        pol = self._politeness_rows()
        self.mega_hosts = frozenset(r["host"] for r in pol if r.get("is_mega_host"))
        # allowed_domains scope (reference: every spider declares one):
        # admission drops links to hosts outside the configured budget table
        self.allowed_hosts = frozenset(r["host"] for r in pol)
        self.seen_shards: list = []
        self.sched_actors: list = []
        self.totals = {"pages": 0, "items": 0, "waves": 0, "fetch_parse_sec": 0.0}

    def _politeness_rows(self) -> list[dict]:
        return self._politeness_override if self._politeness_override is not None else self.store.politeness_rows()

    def _with_live_robots(self, rows: list[dict]) -> list[dict]:
        """Real-network parity with the reference's ROBOTSTXT_OBEY=True
        (settings.py:21, protego per host): when ``fetch_kind == 'http'``,
        GET {scheme}://{host}/robots.txt ONCE per configured host at
        politeness-configure time and use the LIVE text for robots gating;
        the static ``robots_txt`` override is only the fallback when the
        live fetch fails.  Fetched once per engine (cached) — resume and
        later waves reuse the same rules, like Scrapy's per-host
        robots cache."""
        if self._live_robots is None:
            import requests

            from ..stages.fetch import DEFAULT_USER_AGENT

            seed_rows = self._seeds_override if self._seeds_override is not None else self.store.seeds()
            scheme_of = {}
            for s in seed_rows:
                u = urlsplit(s["url"])
                scheme_of.setdefault(u.netloc, u.scheme)
            cache: dict[str, str] = {}
            for host in sorted({r["host"] for r in rows}):
                scheme = scheme_of.get(host, "https")
                try:
                    resp = requests.get(
                        f"{scheme}://{host}/robots.txt",
                        timeout=self.http_opts.get("timeout_s", 10.0),
                        headers={"User-Agent": self.http_opts.get("user_agent", DEFAULT_USER_AGENT)},
                    )
                    if resp.status_code == 200:
                        cache[host] = resp.text
                except requests.RequestException:
                    pass  # unreachable robots -> static fallback below
            self._live_robots = cache
        return [
            {**r, "robots_txt": self._live_robots[r["host"]]} if r["host"] in self._live_robots else r
            for r in rows
        ]

    # --- state management ------------------------------------------------
    def _init_state(self, seen_blobs=None, sched_blobs=None):
        import ray

        pol_rows = self._politeness_rows()
        if self.fetch_kind == "http":  # live per-host robots (ROBOTSTXT_OBEY)
            pol_rows = self._with_live_robots(pol_rows)
        RemoteSeen = ray.remote(num_cpus=0.05)(SeenShard)
        RemoteSched = ray.remote(num_cpus=0.05)(PolitenessScheduler)
        self.seen_shards = [RemoteSeen.remote(self.seen_capacity) for _ in range(self.n_seen_shards)]
        self.sched_actors = [RemoteSched.remote() for _ in range(self.n_sched_shards)]
        if seen_blobs:
            ray.get([a._restore_inplace.remote(b) for a, b in zip(self.seen_shards, seen_blobs)])
        if sched_blobs:
            ray.get([a._restore_inplace.remote(b) for a, b in zip(self.sched_actors, sched_blobs)])
        else:
            ray.get([a.configure.remote(pol_rows) for a in self.sched_actors])

    def _checkpoint_state(self, wave: int):
        import ray

        ckpt = os.path.join(self.out_dir, "checkpoint", f"wave={wave}")
        os.makedirs(ckpt, exist_ok=True)
        seen_blobs = ray.get([a.checkpoint.remote() for a in self.seen_shards])
        sched_blobs = ray.get([a.checkpoint.remote() for a in self.sched_actors])
        for i, b in enumerate(seen_blobs):
            with open(os.path.join(ckpt, f"seen_{i}.bin"), "wb") as f:
                f.write(b)
        for i, b in enumerate(sched_blobs):
            with open(os.path.join(ckpt, f"sched_{i}.bin"), "wb") as f:
                f.write(b)
        manifest = {"wave": wave, "totals": dict(self.totals), "n_seen_shards": self.n_seen_shards, "n_sched_shards": self.n_sched_shards}
        tmp = os.path.join(ckpt, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(ckpt, "manifest.json"))  # atomic completion marker

    def _latest_checkpoint(self) -> int | None:
        base = os.path.join(self.out_dir, "checkpoint")
        if not os.path.isdir(base):
            return None
        waves = []
        for d in os.listdir(base):
            if d.startswith("wave=") and os.path.exists(os.path.join(base, d, "manifest.json")):
                waves.append(int(d.split("=")[1]))
        return max(waves) if waves else None

    # --- seeds -----------------------------------------------------------
    def _seed_frontier(self) -> pa.Table:
        rows = self._seeds_override if self._seeds_override is not None else self.store.seeds()
        batch = pa.Table.from_pydict(
            {
                "url": [r["url"] for r in rows],
                "callback": [r["callback"] for r in rows],
                "method": [r["method"] for r in rows],
                "form_json": [json.dumps(r["form"], sort_keys=True) if r["form"] else "" for r in rows],
                "meta_json": [json.dumps(r["meta"], sort_keys=True) if r["meta"] else "" for r in rows],
                "parent_url": ["" for _ in rows],
                "parent_key": [b"\x00" * 20 for _ in rows],
                "prefecture": [r["prefecture"] for r in rows],
                "depth": pa.array([0] * len(rows), pa.int32()),
                "discovered_at": pa.array([i * 1e-6 for i in range(len(rows))], pa.float64()),
            }
        )
        # admission (canonicalize + sha1 + seen RPC) is CPU-bound over tens
        # of thousands of seed rows.  This is a CONTROL-PLANE step of fixed,
        # modest size (the seed list), so it fans out as plain ray.remote
        # slice tasks over the same admit_fn — a Dataset execution here pays
        # streaming-executor startup + a repartition shuffle that dwarf the
        # work and grow WITH cpu count (measured: 2.1 s @8 -> 3.9 s @32 as a
        # dataset vs <1.5 s flat as tasks); scheduling stays driver-side
        # (one deterministic call per shard)
        import pyarrow as _pa

        import ray as _ray

        admit_fn = make_admit_fn(self.seen_shards, self.n_sched_shards, self.allowed_hosts)
        n = len(batch)
        n_slices = max(1, min(int(_ray.cluster_resources().get("CPU", 8)), n // 4096 + 1))
        admit_task = _ray.remote(num_cpus=1)(admit_fn)
        bounds = [(i * n) // n_slices for i in range(n_slices + 1)]
        refs = [admit_task.remote(batch.slice(lo, hi - lo)) for lo, hi in zip(bounds, bounds[1:]) if hi > lo]
        tables = [t for t in _ray.get(refs) if len(t)]
        admitted = _pa.concat_tables(tables) if tables else _empty_admitted()
        return self._schedule_driver(admitted)

    def _schedule_driver(self, admitted: pa.Table) -> pa.Table:
        """Driver-side scheduling: one batched actor RPC per politeness
        shard (same semantics as the distributed map_groups path)."""
        import pandas as pd

        sched_fn = make_schedule_fn(self.sched_actors, self.n_parts, self.mega_hosts, chain_mode=self.chain_mode)
        frames = []
        df = admitted.to_pandas()
        for _, g in df.groupby("sched_shard", sort=True):
            frames.append(sched_fn(g))
        merged = pd.concat(frames) if frames else pd.DataFrame()
        return to_frontier_table(merged)

    def _admit_driver(self, wave: int, parsed_dir: str) -> int:
        """Small-wave admission fast path: the links control plane of a
        modest wave (<= driver_admit_max_pages pages) is a few thousand
        ~100 B rows — running dedup/admit/schedule on the driver avoids a
        full dataset execution + two shuffles per wave (the dominant cost
        of a many-wave crawl).  Large waves take the distributed path.
        Both paths share the same admission functions, so the frontier is
        bit-identical either way (pytest-verified)."""
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        tbl = pads.dataset(parsed_dir).to_table(columns=["links", "url", "url_key", "prefecture", "depth", "fetched_at"])
        links = explode_links(tbl)
        if len(links) == 0:
            return 0
        df = links.to_pandas()
        df["dedup_key"] = _dedup_key(links).to_pylist()
        df = df.sort_values(["dedup_key", "discovered_at", "parent_key", "url"]).drop_duplicates("dedup_key", keep="first").drop(columns=["dedup_key"])
        admitted = make_admit_fn(self.seen_shards, self.n_sched_shards, self.allowed_hosts)(pa.Table.from_pandas(df, preserve_index=False))
        frontier = self._schedule_driver(admitted)
        if len(frontier) == 0:
            return 0
        next_path = os.path.join(self.out_dir, "frontier", f"wave={wave + 1}")
        shutil.rmtree(next_path, ignore_errors=True)
        os.makedirs(next_path, exist_ok=True)
        pq.write_table(frontier, os.path.join(next_path, "frontier.parquet"))
        return len(frontier)

    # --- one wave --------------------------------------------------------
    def _n_blocks(self, n_rows: int) -> int:
        """Enough blocks that map stages parallelize at the current cluster
        width, few enough that tiny waves don't drown in per-task overhead."""
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        return max(1, min(2 * cpus, n_rows // 128 + 1))

    def _run_wave(self, wave: int, frontier_path: str, n_frontier: int) -> tuple[int, int]:
        """Execute one wave in TWO dataset executions (throughput-critical:
        per-execution startup is the dominant cost of a many-wave crawl):
          A: frontier -> fetch -> parse -> write parsed/wave=w   (fused, streaming)
          B: parsed(links cols only) -> dedup -> admit -> schedule -> frontier w+1
        Returns (pages fetched, rows admitted to next wave)."""
        import pyarrow.dataset as pads
        import ray.data as rd

        import sys
        import time as _time

        t0 = _time.time()
        in_task_derived = os.environ.get("CRAWL_DERIVED_IN_TASK", "1") != "0"
        chain_fn = make_chain_fetch_fn(
            self.spec, self.seen_shards, self.sched_actors, self.n_sched_shards, wave,
            registry=self.registry, fetch_kind=self.fetch_kind, http_opts=self.http_opts,
            derived_root=self.out_dir if in_task_derived else None,
            parsed_root=self.out_dir if self.fused_wave else None,
        )
        parsed_dir = os.path.join(self.out_dir, "parsed", f"wave={wave}")
        shutil.rmtree(parsed_dir, ignore_errors=True)  # idempotent re-run of a killed wave
        for sub in ("items", "documents", "lineage"):  # same idempotency for in-task derived writes
            shutil.rmtree(os.path.join(self.out_dir, sub, f"w{wave}"), ignore_errors=True)
        # ONE batch per fetch task (blocks = ceil(rows/batch)), batch sized
        # WIDTH-AWARE to ~5 task rounds per wave: short tasks pack tightly
        # at wide clusters (no ragged second batch, small straggler tail)
        # while narrow widths keep bigger tasks so per-task fixed costs
        # (lease RPCs, table build, parquet footer) stay amortized.
        # Interleaved 32-cpu sweep: one-batch tasks of ~256 rows gave
        # 9.2-11.4k pages/s vs 7.3-8.4k (blocks=2*cpus, batch=512) and
        # 8.0-9.8k (batch=128); at 8 cpus ~256-row tasks LOST ~15% to
        # per-task overhead, hence the rows/(5*cpus) auto-size.
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        batch = self.fetch_batch_size or min(2048, max(256, -(-n_frontier // (5 * cpus))))
        fetch_nb = int(os.environ.get("CRAWL_FETCH_NB", "0")) or max(1, -(-n_frontier // batch))
        frontier_ds = rd.read_parquet(frontier_path, override_num_blocks=fetch_nb)
        fetched = frontier_ds.map_batches(chain_fn, batch_format="pyarrow", batch_size=batch)

        if self.fused_wave:
            # ONE dataset execution per wave: fetch tasks persisted the
            # parsed store in-task and emitted only the link columns, so
            # the admission chain streams straight off the fetch stage
            # (n_key_parts sized from the frontier — non-chain waves have
            # pages ≈ frontier rows, and the count is a perf knob only)
            next_path = self._admission_chain(fetched, wave, self._n_blocks(max(n_frontier, 1)))
            t_wave = _time.time() - t0
            self.totals["fetch_parse_sec"] = self.totals.get("fetch_parse_sec", 0.0) + t_wave
            n_pages = pads.dataset(parsed_dir).count_rows() if os.path.isdir(parsed_dir) else 0
            n_next = pads.dataset(next_path).count_rows() if os.path.isdir(next_path) else 0
            if self.debug_timing:
                print(f"[wave {wave}] pages={n_pages} fused wave={t_wave:.2f}s", file=sys.stderr, flush=True)
            self.totals["pages"] += n_pages
            self.totals["waves"] = wave + 1
            return n_pages, n_next

        fetched.write_parquet(parsed_dir)
        t_fetch = _time.time() - t0
        self.totals["fetch_parse_sec"] = self.totals.get("fetch_parse_sec", 0.0) + t_fetch
        n_pages = pads.dataset(parsed_dir).count_rows()

        if n_pages <= self.driver_admit_max_pages:
            t1 = _time.time()
            n_next = self._admit_driver(wave, parsed_dir)
            if self.debug_timing:
                print(f"[wave {wave}] pages={n_pages} fetch+parse+write={t_fetch:.2f}s admit={_time.time() - t1:.2f}s", file=sys.stderr, flush=True)
            self.totals["pages"] += n_pages
            self.totals["waves"] = wave + 1
            return n_pages, n_next

        links_src = rd.read_parquet(
            parsed_dir,
            columns=["links", "url", "url_key", "prefecture", "depth", "fetched_at"],
            override_num_blocks=self._n_blocks(n_pages),
        )
        next_path = self._admission_chain(links_src, wave, self._n_blocks(n_pages))
        n_next = pads.dataset(next_path).count_rows() if os.path.isdir(next_path) else 0
        self.totals["pages"] += n_pages
        self.totals["waves"] = wave + 1
        return n_pages, n_next

    def _admission_chain(self, links_src, wave: int, n_key_parts: int) -> str:
        """The distributed admission pipeline (shared by the standard and
        fused wave paths): explode links -> first-discovery-wins dedup via
        the segment-vectorized ``first_per_key`` shape (batch-local
        pre-prune, ONE coarse hash exchange on a hash of the key,
        vectorized per-partition pick — NOT a per-distinct-URL
        ``map_groups``) -> seen-set admit -> per-shard schedule -> next
        frontier parquet.  Returns the next frontier path (execution is
        driven by the ``write_parquet``)."""
        import pyarrow.dataset as pads  # noqa: F401

        from ..functions.window import first_per_key

        links = links_src.map_batches(explode_links, batch_format="pyarrow")

        def with_dedup_key(t: pa.Table) -> pa.Table:
            import pandas as pd

            dk = _dedup_key(t)
            kp = pd.util.hash_array(dk.to_numpy(zero_copy_only=False)).view(np.int64)
            return t.append_column("dedup_key", dk).append_column(
                "_dk_hash", pa.array(kp, pa.int64())
            )

        deduped = first_per_key(
            links.map_batches(with_dedup_key, batch_format="pyarrow"),
            key_cols=["dedup_key"],
            order_cols=["discovered_at", "parent_key", "url"],
            part_col="_dk_hash",
            n_key_parts=n_key_parts,
        ).map_batches(lambda t: t.drop_columns(["_dk_hash"]), batch_format="pyarrow")
        admitted = deduped.map_batches(make_admit_fn(self.seen_shards, self.n_sched_shards, self.allowed_hosts), batch_format="pyarrow")
        scheduled = admitted.groupby("sched_shard").map_groups(
            make_schedule_fn(self.sched_actors, self.n_parts, self.mega_hosts, chain_mode=self.chain_mode),
            batch_format="pandas",
        )
        next_frontier = scheduled.map_batches(to_frontier_table, batch_format="pandas")
        next_path = os.path.join(self.out_dir, "frontier", f"wave={wave + 1}")
        shutil.rmtree(next_path, ignore_errors=True)
        next_frontier.write_parquet(next_path)
        return next_path

    def finalize(self):
        """Metrics aggregate ONLY.  The row-level derived stores (items /
        documents / lineage) are written by the fetch tasks themselves
        (:func:`_write_derived`): the batch is decoded in memory there, so
        the nested parsed store is never re-read — finalize's dataset pass
        touches just the FLAT metrics columns (wave/host/counters), a few
        MB even on the bench corpus.  This replaced four concurrent
        full-store dataset executions whose competing executors each
        assumed they owned the whole CPU pool and ANTI-scaled (measured:
        21 s at 32 CPUs vs 11 s at 8 on the bench corpus); the in-task
        form costs ~0 extra wall time in the fetch stage and drops
        finalize to the metrics aggregate.  Idempotent: metrics is a full
        rewrite; derived stores are rewritten per wave by `_run_wave`."""
        import sys as _sys
        import time as _t

        import pyarrow.dataset as pads
        import pyarrow.parquet as pq
        import ray.data as rd
        from ray.data.aggregate import Sum

        parsed_dir = os.path.join(self.out_dir, "parsed")
        if not os.path.isdir(parsed_dir):
            return
        t0 = _t.time()
        # schema-stable EMPTY derived stores for zero-page runs (readers of
        # items/documents/lineage must see the schema even with no rows)
        empty = PARSED_SCHEMA.empty_table().append_column("wave", pa.array([], pa.int32()))
        for sub, derive in (("items", explode_items), ("documents", explode_documents), ("lineage", lineage_batch)):
            d = os.path.join(self.out_dir, sub)
            os.makedirs(d, exist_ok=True)
            if not any(files for _, _, files in os.walk(d)):
                pq.write_table(derive(empty), os.path.join(d, "empty.parquet"))

        shutil.rmtree(os.path.join(self.out_dir, "metrics"), ignore_errors=True)  # full rewrite
        n_rows = pads.dataset(parsed_dir).count_rows()
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        nb = max(1, min(2 * cpus, n_rows // 512 + 1))
        _patch_fsspec_http_probe()

        if os.environ.get("CRAWL_DERIVED_IN_TASK", "1") == "0":
            # measurement fallback (A/B vs the in-task default): derive the
            # three row stores in ONE single-executor pass over the full
            # parsed store, then aggregate metrics from the partials
            out_dirs = {s: os.path.join(self.out_dir, s) for s in ("items", "documents", "lineage")}
            for d in out_dirs.values():
                shutil.rmtree(d, ignore_errors=True)
                os.makedirs(d, exist_ok=True)

            def derive_all(batch: pa.Table) -> pa.Table:
                import uuid

                tag = uuid.uuid4().hex[:16]
                for sub, derive in (("items", explode_items), ("documents", explode_documents), ("lineage", lineage_batch)):
                    pq.write_table(derive(batch), os.path.join(out_dirs[sub], f"b-{tag}.parquet"))
                return metrics_partial_batch(batch)

            src = rd.read_parquet(parsed_dir, override_num_blocks=nb).map_batches(derive_all, batch_format="pyarrow")
        else:
            src = rd.read_parquet(
                parsed_dir,
                columns=["wave", "host", "n_items", "n_links", "bytes", "status", "attempts"],
                override_num_blocks=nb,
            ).map_batches(metrics_partial_batch, batch_format="pyarrow")
        metrics = (
            src.groupby(["wave", "host"])
            .aggregate(
                Sum("pages", alias_name="pages"),
                Sum("items", alias_name="items"),
                Sum("links", alias_name="links"),
                Sum("bytes", alias_name="bytes"),
                Sum("errors", alias_name="errors"),
                Sum("retries", alias_name="retries"),
            )
        )
        metrics.write_parquet(os.path.join(self.out_dir, "metrics"))
        if self.debug_timing:
            print(f"[finalize/metrics-only] {_t.time() - t0:.2f}s", file=_sys.stderr, flush=True)

    def shutdown(self):
        """Kill shard actors (queries/CLI create engines per call; without
        this, each call leaks a dozen idle actors into the session)."""
        import ray

        for a in self.seen_shards + self.sched_actors:
            try:
                ray.kill(a)
            except Exception:
                pass
        self.seen_shards, self.sched_actors = [], []

    # --- public API ------------------------------------------------------
    def run(self, resume: bool = False) -> dict:
        os.makedirs(self.out_dir, exist_ok=True)
        if not resume:
            # fresh run into a reused out_dir: stale waves from a previous,
            # deeper run would otherwise survive _run_wave's per-wave rmtree
            # and contaminate finalize()'s whole-tree aggregation
            for d in ("parsed", "frontier", "checkpoint", "items", "documents", "lineage", "metrics"):
                shutil.rmtree(os.path.join(self.out_dir, d), ignore_errors=True)
        start_wave = 0
        seen_blobs = sched_blobs = None
        if resume:
            last = self._latest_checkpoint()
            if last is not None:
                ckpt = os.path.join(self.out_dir, "checkpoint", f"wave={last}")
                with open(os.path.join(ckpt, "manifest.json")) as f:
                    manifest = json.load(f)
                seen_blobs = [open(os.path.join(ckpt, f"seen_{i}.bin"), "rb").read() for i in range(manifest["n_seen_shards"])]
                sched_blobs = [open(os.path.join(ckpt, f"sched_{i}.bin"), "rb").read() for i in range(manifest["n_sched_shards"])]
                self.totals = manifest["totals"]
                start_wave = last + 1
        import sys as _sys
        import time as _t

        t0 = _t.time()
        self._init_state(seen_blobs, sched_blobs)
        if self.debug_timing:
            print(f"[init_state] {_t.time() - t0:.2f}s", file=_sys.stderr, flush=True)

        if start_wave == 0:
            t0 = _t.time()
            frontier = self._seed_frontier()
            path0 = os.path.join(self.out_dir, "frontier", "wave=0")
            os.makedirs(path0, exist_ok=True)
            import pyarrow.parquet as pq

            pq.write_table(frontier, os.path.join(path0, "seed.parquet"))
            if self.debug_timing:
                print(f"[seed] {len(frontier)} rows {_t.time() - t0:.2f}s", file=_sys.stderr, flush=True)

        wave = start_wave
        import pyarrow.dataset as pads

        while wave < self.max_waves:
            fpath = os.path.join(self.out_dir, "frontier", f"wave={wave}")
            if not os.path.isdir(fpath) or not os.listdir(fpath):
                break
            n_rows = pads.dataset(fpath).count_rows()
            if n_rows == 0:
                break
            n_pages, n_next = self._run_wave(wave, fpath, n_rows)
            t0 = _t.time()
            if n_next > 0 and (wave + 1) % self.checkpoint_interval == 0:
                self._checkpoint_state(wave)
                if self.debug_timing:
                    print(f"[checkpoint {wave}] {_t.time() - t0:.2f}s", file=_sys.stderr, flush=True)
            wave += 1
            if n_next == 0:
                break
        t0 = _t.time()
        self.finalize()
        if self.debug_timing:
            print(f"[finalize] {_t.time() - t0:.2f}s", file=_sys.stderr, flush=True)
        metrics_dir = os.path.join(self.out_dir, "metrics")
        if os.path.isdir(metrics_dir):
            import pyarrow.dataset as pads

            m = pads.dataset(metrics_dir).to_table(columns=["items"])
            self.totals["items"] = int(pc.sum(m.column("items")).as_py() or 0)
        if wave > start_wave:
            t0 = _t.time()
            self._checkpoint_state(wave - 1)  # final checkpoint: shard queues drained during finalize
            if self.debug_timing:
                print(f"[checkpoint final] {_t.time() - t0:.2f}s", file=_sys.stderr, flush=True)
        return dict(self.totals)


def _dedup_key(t: pa.Table) -> pa.Array:
    """Within-wave dedup key: method|url|form (resolved url comes later —
    dedup on the raw href + parent base is conservative but deterministic;
    the seen set is the exact global gate)."""
    vals = []
    urls = t.column("url").to_pylist()
    parents = t.column("parent_url").to_pylist()
    methods = t.column("method").to_pylist()
    forms = t.column("form_json").to_pylist()
    for u, p, m, f in zip(urls, parents, methods, forms):
        c = canonicalize(u, base=p or None)
        vals.append(f"{m}|{c}|{f}")
    return pa.array(vals, pa.string())


_FSSPEC_PATCHED = False


def _patch_fsspec_http_probe() -> None:
    """Work around a concurrent-import race in Ray's read path.

    ``ray.data.datasource.path_util._is_http_filesystem`` probes
    ``fsspec.implementations.http`` on EVERY read; without aiohttp the
    import always fails (cleanly, as ModuleNotFoundError) and re-runs, so
    two dataset executions on different driver threads can race on the
    half-initialized module and surface an uncaught plain ImportError.
    We never read over HTTP — when aiohttp is absent, replace the probe
    with a constant False."""
    global _FSSPEC_PATCHED
    if _FSSPEC_PATCHED:
        return
    try:
        import aiohttp  # noqa: F401

        _FSSPEC_PATCHED = True
        return  # real probe works; leave it
    except ImportError:
        pass
    try:
        from ray.data.datasource import path_util

        path_util._is_http_filesystem = lambda fs: False
    except (ImportError, AttributeError):
        pass
    _FSSPEC_PATCHED = True
