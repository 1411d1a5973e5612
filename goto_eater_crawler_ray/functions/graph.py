"""Dataset-native graph algorithms beyond connected components.

PageRank over the crawl link graph — the classic crawl-prioritization
signal (rank hosts/pages by link mass to order future fetches).  Power
iteration expressed entirely in Dataset ops:

  - static per-node state (out-degree) rides INSIDE the ranks table, so
    each iteration is exactly ONE hash join (edges x ranks on src) and
    ONE groupby-Sum (contributions routed to dst) plus two scalar
    aggregates — no per-node driver state at any scale,
  - dangling mass (rank parked on nodes with no out-links) is one
    filtered Sum per iteration, redistributed uniformly, so ranks stay a
    probability distribution,
  - fixed iteration count (PageRank converges geometrically at the
    damping rate; 10 iterations ≈ 0.85^10 < 0.2 residual bound, the
    standard web-graph setting).

Float caveat: groupby-Sum addition order is partition-dependent, so
ranks are deterministic only to ~1e-15 — correctness is pytest-pinned
against an identical-formula numpy power iteration (allclose 1e-9),
not a SQL hash twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._partitions import auto_num_partitions
import pyarrow.compute as pc


def pagerank(
    edges_ds,
    damping: float = 0.85,
    n_iter: int = 10,
    num_partitions: int | None = None,
    max_local_edges: int = 262_144,
):
    """PageRank over ``edges_ds`` with columns (src:int64, dst:int64).
    Returns a Dataset (node:int64, rank:float64); ranks sum to 1.

    Small graphs (<= ``max_local_edges`` edges, a few MB — the same
    hard gate the broadcast-join ops use) take a LOCAL numpy power
    iteration: each distributed iteration costs three exchanges
    (edges⋈ranks, groupby-Sum, nodes⋈sums), pure framework latency when
    the whole graph fits in one array.  Above the gate, the
    dataset-native loop below runs — one join + one groupby-Sum per
    iteration, rank/out-degree state only, never adjacency lists on the
    driver."""
    from ray.data.aggregate import Sum

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges <= max_local_edges:
        return _pagerank_local(edges, damping, n_iter)
    if num_partitions is None:
        num_partitions = auto_num_partitions(n_edges)

    # node universe = src ∪ dst, with out-degree (0 for sinks)
    def srcs(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("src").cast(pa.int64()), "out": pa.array(np.ones(t.num_rows, np.int64))})

    def dsts(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("dst").cast(pa.int64()), "out": pa.array(np.zeros(t.num_rows, np.int64))})

    nodes = (
        edges.map_batches(srcs, batch_format="pyarrow")
        .union(edges.map_batches(dsts, batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Sum("out", alias_name="outdeg"))
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}))

    r0 = 1.0 / n_nodes
    ranks = nodes.map_batches(
        lambda t: t.append_column("rank", pa.array(np.full(t.num_rows, r0), pa.float64())),
        batch_format="pyarrow",
    ).materialize()

    # the per-iteration dangling-mass aggregate is an extra dataset
    # execution; skip it entirely when the graph has no sinks
    n_dangling = nodes.filter(expr="outdeg == 0").count()

    for _ in range(n_iter):
        dangling = (
            (ranks.filter(expr="outdeg == 0").aggregate(Sum("rank", alias_name="m"))["m"] or 0.0)
            if n_dangling
            else 0.0
        )
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        hop = edges.join(ranks, join_type="inner", num_partitions=num_partitions, on=("src",), right_on=("node",))

        def contrib(t: pa.Table) -> pa.Table:
            c = pc.divide(t.column("rank"), pc.cast(t.column("outdeg"), pa.float64()))
            return pa.table({"node": t.column("dst").cast(pa.int64()), "s": c})

        sums = hop.map_batches(contrib, batch_format="pyarrow").groupby("node").aggregate(Sum("s", alias_name="s"))
        merged = nodes.join(sums, join_type="left_outer", num_partitions=num_partitions, on=("node",))

        def new_rank(t: pa.Table) -> pa.Table:
            s = pc.coalesce(t.column("s"), pa.scalar(0.0, pa.float64()))
            r = pc.add(pa.scalar(base, pa.float64()), pc.multiply(pa.scalar(damping, pa.float64()), s))
            return pa.table({"node": t.column("node"), "outdeg": t.column("outdeg"), "rank": r})

        ranks = merged.map_batches(new_rank, batch_format="pyarrow").materialize()

    return ranks.drop_columns(["outdeg"])


def _gather_nonempty(ds) -> pa.Table:
    """Driver-side gather for the gated small-graph paths: drop the
    zero-column empty blocks Ray emits from aggregates/repartitions
    (they carry no schema and poison concat_tables)."""
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0] if hasattr(ds, "to_arrow_refs") else [ds]
    if not tabs:
        return None
    return pa.concat_tables(tabs)


def _pagerank_local(edges, damping: float, n_iter: int):
    """Gated small-graph path: identical update rule to the distributed
    loop (dangling mass redistributed, same base term), one numpy
    scatter-add per iteration."""
    import ray
    import ray.data as rd

    t = _gather_nonempty(edges)
    if t is None:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}))
    src = t.column("src").cast(pa.int64()).to_numpy(zero_copy_only=False)
    dst = t.column("dst").cast(pa.int64()).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([src, dst]))
    if len(nodes) == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    n = len(nodes)
    outdeg = np.bincount(si, minlength=n).astype(np.float64)
    dangling_mask = outdeg == 0
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = rank[dangling_mask].sum() if dangling_mask.any() else 0.0
        base = (1.0 - damping) / n + damping * dangling / n
        contrib = rank[si] / outdeg[si]
        s = np.bincount(di, weights=contrib, minlength=n)
        rank = base + damping * s
    return rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64()), "rank": pa.array(rank, pa.float64())}))


def pagerank_exact(
    edges_ds, damping: float = 0.85, n_iter: int = 5, num_partitions: int | None = None, max_local_edges: int = 262_144
):
    """EXACT-arithmetic PageRank: ranks are nano-unit int64 and every
    iteration rounds each edge contribution to an integer BEFORE the
    sum — integer addition is order-independent, so the result is
    bit-identical across partitionings, widths, AND engines, which is
    what makes this variant SQL-ORACLE-PINNABLE (an unrolled CTE chain
    evaluating the token-identical ``round(0.85 * r / outdeg)``) where
    the float :func:`pagerank` is only pytest-pinned to 1e-9.

    Requires a graph with NO dangling nodes (every node has out-degree
    ≥ 1 — e.g. any bidirectional edge list); raises otherwise, because
    the dangling-mass term would need a per-iteration scalar that the
    unrolled SQL twin can't express without aggregates-in-recursion.
    Same per-iteration shape as :func:`pagerank`: one hash join
    (edges ⋈ ranks on src), one groupby-Sum (contributions to dst),
    one join back to the static node table."""
    from ray.data.aggregate import Min, Sum

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges <= max_local_edges:
        # same small-graph gate as the float path: below it, every
        # distributed iteration (3 exchanges) is pure framework latency.
        # The LOCAL loop is bit-identical to the distributed one BY
        # CONSTRUCTION — the per-edge rounding and int64 sums carry no
        # order dependence — so the gate cannot change any result.
        return _pagerank_exact_local(edges, damping, n_iter)
    if num_partitions is None:
        num_partitions = auto_num_partitions(n_edges)

    def srcs(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("src").cast(pa.int64()), "out": pa.array(np.ones(t.num_rows, np.int64))})

    def dsts(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("dst").cast(pa.int64()), "out": pa.array(np.zeros(t.num_rows, np.int64))})

    nodes = (
        edges.map_batches(srcs, batch_format="pyarrow")
        .union(edges.map_batches(dsts, batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Sum("out", alias_name="outdeg"))
        .repartition(num_partitions)  # zero-column empty-block scrub before the per-iteration joins
        .materialize()
    )
    if nodes.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()), "rank_nano": pa.array([], pa.int64())}))
    if int(nodes.aggregate(Min("outdeg", alias_name="m"))["m"]) == 0:
        raise ValueError("pagerank_exact requires a dangling-free graph (every node with out-degree >= 1)")

    BASE = int(np.floor((1.0 - damping) * 1e9 + 0.5))  # 150_000_000 at d=0.85
    ranks = nodes.map_batches(
        lambda t: t.append_column("rank_nano", pa.array(np.full(t.num_rows, 1_000_000_000, np.int64), pa.int64())),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(n_iter):
        hop = edges.join(ranks, join_type="inner", num_partitions=num_partitions, on=("src",), right_on=("node",))

        def contrib(t: pa.Table) -> pa.Table:
            r = t.column("rank_nano").to_numpy(zero_copy_only=False).astype(np.float64)
            od = t.column("outdeg").to_numpy(zero_copy_only=False).astype(np.float64)
            # token-identical to the twin: round(0.85 * r / outdeg), the
            # two IEEE ops are correctly rounded so the doubles agree
            c = np.sign(r) * np.floor(np.abs(damping * r / od) + 0.5)
            return pa.table({"node": t.column("dst").cast(pa.int64()), "c": pa.array(c.astype(np.int64), pa.int64())})

        sums = (
            hop.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("c", alias_name="s"))
            .repartition(num_partitions)  # empty-block scrub before the node join
        )
        # LEFT outer: nodes with NO in-edges still exist and keep emitting
        # their outbound contributions next round (an inner join would
        # silently drop them and diverge from the local path on legal
        # dangling-free-but-asymmetric graphs)
        ranks = (
            nodes.join(sums, join_type="left_outer", num_partitions=num_partitions, on=("node",))
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node").cast(pa.int64()),
                        "outdeg": t.column("outdeg").cast(pa.int64()),
                        "rank_nano": pa.array(
                            BASE
                            + pc.fill_null(t.column("s"), 0).cast(pa.int64()).to_numpy(zero_copy_only=False),
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return ranks.drop_columns(["outdeg"])


def _pagerank_exact_local(edges, damping: float, n_iter: int):
    """Gated small-graph path for :func:`pagerank_exact`: identical
    integer update rule (round each edge contribution, int64 sums), one
    exact ``np.add.at`` scatter per iteration."""
    import ray
    import ray.data as rd

    t = _gather_nonempty(edges)
    if t is None:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()), "rank_nano": pa.array([], pa.int64())}))
    src = t.column("src").cast(pa.int64()).to_numpy(zero_copy_only=False)
    dst = t.column("dst").cast(pa.int64()).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([src, dst]))
    if len(nodes) == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()), "rank_nano": pa.array([], pa.int64())}))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    n = len(nodes)
    outdeg = np.bincount(si, minlength=n).astype(np.int64)
    if outdeg.min() == 0:
        raise ValueError("pagerank_exact requires a dangling-free graph (every node with out-degree >= 1)")
    BASE = np.int64(np.floor((1.0 - damping) * 1e9 + 0.5))
    r = np.full(n, 1_000_000_000, np.int64)
    for _ in range(n_iter):
        c = np.floor(np.abs(damping * r[si].astype(np.float64) / outdeg[si].astype(np.float64)) + 0.5).astype(np.int64)
        s = np.zeros(n, np.int64)
        np.add.at(s, di, c)
        r = BASE + s
    return rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64()), "rank_nano": pa.array(r, pa.int64())}))


def bfs_hops(edges_ds, seeds_ds, n_hops: int = 3, num_partitions: int | None = None, max_local_edges: int = 262_144):
    """Bounded-hop BFS: minimum hop distance (0..n_hops) from a seed SET
    to every reachable node — the reachability / crawl-frontier-depth
    operator, all-integer and therefore ORACLE-PINNABLE as an unrolled
    CTE chain (each hop: neighbors at d+1 unioned with known, groupby
    Min).  ``seeds_ds`` carries a ``node`` column.  Per hop: one hash
    join (frontier ⋈ edges on src) + one groupby-Min — the frontier,
    never the graph, is the iterated state.  Small graphs take a local
    numpy loop with the identical rule (bit-identical by construction)."""
    from ray.data.aggregate import Min

    edges = edges_ds.materialize()
    seeds = seeds_ds.materialize()
    n_edges = edges.count()
    if n_edges <= max_local_edges:
        return _bfs_hops_local(edges, seeds, n_hops)
    if num_partitions is None:
        num_partitions = auto_num_partitions(n_edges)

    dist = (
        seeds.map_batches(
            lambda t: pa.table(
                {"node": t.column("node").cast(pa.int64()), "d": pa.array(np.zeros(t.num_rows, np.int64), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        # dedup the seed frontier up front: duplicate seed rows (or
        # n_hops=0) would otherwise emit duplicate (node, d) rows,
        # diverging from the local path's np.unique
        .groupby("node")
        .aggregate(Min("d", alias_name="d"))
        .repartition(num_partitions)  # zero-column empty-block scrub
        .materialize()
    )
    if dist.count() == 0:  # empty seed set: pin the (node, d) schema
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}))
    for _ in range(n_hops):
        hop = dist.join(edges, join_type="inner", num_partitions=num_partitions, on=("node",), right_on=("src",))
        nxt = hop.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("dst").cast(pa.int64()),
                    "d": pa.array(t.column("d").to_numpy(zero_copy_only=False) + 1, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        dist = (
            dist.union(nxt)
            .groupby("node")
            .aggregate(Min("d", alias_name="d"))
            .repartition(num_partitions)  # zero-column empty-block scrub before the next hop join
            .materialize()
        )
    return dist


def _bfs_hops_local(edges, seeds, n_hops: int):
    """Gated small-graph path: identical min-distance rule, one scatter
    per hop."""
    import ray
    import ray.data as rd

    te = _gather_nonempty(edges)
    ts = _gather_nonempty(seeds)
    if ts is None:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}))
    src = te.column("src").cast(pa.int64()).to_numpy(zero_copy_only=False) if te is not None else np.array([], np.int64)
    dst = te.column("dst").cast(pa.int64()).to_numpy(zero_copy_only=False) if te is not None else np.array([], np.int64)
    seed = np.unique(ts.column("node").cast(pa.int64()).to_numpy(zero_copy_only=False))
    if len(seed) == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}))
    nodes = np.unique(np.concatenate([src, dst, seed]))
    si, di = np.searchsorted(nodes, src), np.searchsorted(nodes, dst)
    INF = np.int64(1 << 60)
    d = np.full(len(nodes), INF, np.int64)
    d[np.searchsorted(nodes, seed)] = 0
    for _ in range(n_hops):
        nd = d.copy()
        cand = d[si] + 1
        np.minimum.at(nd, di, cand)
        d = np.minimum(d, nd)
    keep = d < INF
    return rd.from_arrow(
        pa.table({"node": pa.array(nodes[keep], pa.int64()), "d": pa.array(d[keep], pa.int64())})
    )


def hits_exact(edges_ds, n_iter: int = 4, num_partitions: int | None = None, max_local_edges: int = 262_144):
    """EXACT-arithmetic HITS (Kleinberg hubs/authorities): scores are
    nano-unit int64, each iteration computes authority(j) = Σ hub(i)
    over in-edges then hub(i) = Σ auth(j) over out-edges (exact integer
    sums), and renormalizes each side to max 1e9 with the one shared
    ``round(1e9 * s / max_s)`` expression — so, like
    :func:`pagerank_exact`, the result is bit-identical across widths
    and engines and an unrolled CTE twin can hash-match it.  The
    per-iteration max is a scalar aggregate (the legal driver kind).
    Returns (node, hub_nano, auth_nano) for every node."""
    from ray.data.aggregate import Max, Min, Sum

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges <= max_local_edges:
        return _hits_exact_local(edges, n_iter)
    if num_partitions is None:
        num_partitions = auto_num_partitions(n_edges)

    def degs(t: pa.Table) -> pa.Table:
        s = t.column("src").combine_chunks().cast(pa.int64())
        d = t.column("dst").combine_chunks().cast(pa.int64())
        n = len(s)
        return pa.table(
            {
                "node": pa.concat_arrays([s, d]),
                "outd": pa.array(np.concatenate([np.ones(n, np.int64), np.zeros(n, np.int64)]), pa.int64()),
                "ind": pa.array(np.concatenate([np.zeros(n, np.int64), np.ones(n, np.int64)]), pa.int64()),
            }
        )

    nodes = (
        edges.map_batches(degs, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("outd", alias_name="outd"), Sum("ind", alias_name="ind"))
        .materialize()
    )
    # the per-iteration INNER joins keep exactly the nodes with both an
    # in- and an out-edge — require that of EVERY node (any bidirectional
    # edge list qualifies) so the distributed and local paths agree
    deg_min = nodes.aggregate(Min("outd", alias_name="o"), Min("ind", alias_name="i"))
    if int(deg_min["o"] or 0) == 0 or int(deg_min["i"] or 0) == 0:
        raise ValueError("hits_exact requires every node to have both in- and out-edges (e.g. a bidirectional edge list)")
    scores = (
        nodes.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node").cast(pa.int64()),
                    "hub_nano": pa.array(np.full(t.num_rows, 1_000_000_000, np.int64), pa.int64()),
                    "auth_nano": pa.array(np.full(t.num_rows, 1_000_000_000, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
        .materialize()
    )

    def _renorm(col: str, ds):
        mx = float(ds.aggregate(Max(col, alias_name="m"))["m"])

        def f(t: pa.Table) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            r = np.floor(np.abs(1e9 * v / mx) + 0.5).astype(np.int64)
            i = t.column_names.index(col)
            return t.set_column(i, col, pa.array(r, pa.int64()))

        return ds.map_batches(f, batch_format="pyarrow")

    for _ in range(n_iter):
        # authority pass: a(j) = Σ h(i) over edges i -> j
        hop_a = edges.join(scores, join_type="inner", num_partitions=num_partitions, on=("src",), right_on=("node",))
        auth = (
            hop_a.map_batches(
                lambda t: pa.table({"node": t.column("dst").cast(pa.int64()), "s": t.column("hub_nano")}),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Sum("s", alias_name="auth_raw"))
            .repartition(num_partitions)
        )
        merged = (
            scores.drop_columns(["auth_nano"])
            .join(auth, join_type="inner", num_partitions=num_partitions, on=("node",))
            .materialize()  # consumed by BOTH the hub pass and the join-back (diamond-DAG hazard)
        )
        # hub pass: h(i) = Σ a_raw(j) over edges i -> j (pre-renorm sums,
        # matching the twin's CTE order), then renormalize both sides
        hop_h = edges.join(merged, join_type="inner", num_partitions=num_partitions, on=("dst",), right_on=("node",))
        hub = (
            hop_h.map_batches(
                lambda t: pa.table({"node": t.column("src").cast(pa.int64()), "s": t.column("auth_raw")}),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Sum("s", alias_name="hub_raw"))
            .repartition(num_partitions)
        )
        joined = merged.join(hub, join_type="inner", num_partitions=num_partitions, on=("node",)).materialize()
        joined = _renorm("auth_raw", joined)
        joined = _renorm("hub_raw", joined)
        scores = joined.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node").cast(pa.int64()),
                    "hub_nano": t.column("hub_raw").cast(pa.int64()),
                    "auth_nano": t.column("auth_raw").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    return scores


def _hits_exact_local(edges, n_iter: int):
    """Gated small-graph path: identical integer update + renorm rule."""
    import ray.data as rd

    t = _gather_nonempty(edges)
    if t is None:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "hub_nano": pa.array([], pa.int64()), "auth_nano": pa.array([], pa.int64())}
            )
        )
    src = t.column("src").cast(pa.int64()).to_numpy(zero_copy_only=False)
    dst = t.column("dst").cast(pa.int64()).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([src, dst]))
    si, di = np.searchsorted(nodes, src), np.searchsorted(nodes, dst)
    n = len(nodes)
    outd = np.bincount(si, minlength=n)
    ind = np.bincount(di, minlength=n)
    if outd.min() == 0 or ind.min() == 0:
        raise ValueError("hits_exact requires every node to have both in- and out-edges (e.g. a bidirectional edge list)")
    hub = np.full(n, 1_000_000_000, np.int64)
    auth = np.full(n, 1_000_000_000, np.int64)
    for _ in range(n_iter):
        a_raw = np.zeros(n, np.int64)
        np.add.at(a_raw, di, hub[si])
        h_raw = np.zeros(n, np.int64)
        np.add.at(h_raw, si, a_raw[di])
        auth = np.floor(np.abs(1e9 * a_raw.astype(np.float64) / float(a_raw.max())) + 0.5).astype(np.int64)
        hub = np.floor(np.abs(1e9 * h_raw.astype(np.float64) / float(h_raw.max())) + 0.5).astype(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "hub_nano": pa.array(hub, pa.int64()),
                "auth_nano": pa.array(auth, pa.int64()),
            }
        )
    )
