"""Unit tests: canonicalization, bloom, cuckoo, sharded seen set, politeness."""

import hashlib

import numpy as np
import pytest

from goto_eater_crawler_ray.state.bloom import BlockedBloom
from goto_eater_crawler_ray.state.canonical import canonicalize, canonicalize_batch, host_of, url_sha1
from goto_eater_crawler_ray.state.cuckoo import CuckooFilter
from goto_eater_crawler_ray.state.politeness import PolitenessScheduler, parse_robots, robots_allowed
from goto_eater_crawler_ray.state.seen import SeenShard, ShardedSeenSet, shard_of


def _keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, 20), dtype=np.uint8)


class TestCanonical:
    def test_relative_resolution(self):
        # reference: response.urljoin (tochigi.py:67)
        assert canonicalize("page2.html", base="http://example.jp/list/page1.html") == "http://example.jp/list/page2.html"

    def test_normalization(self):
        assert canonicalize("HTTP://Example.JP:80/a#frag") == "http://example.jp/a"
        assert canonicalize("https://example.jp:443/") == "https://example.jp/"
        assert canonicalize("http://example.jp") == "http://example.jp/"

    def test_query_param_strip_and_sort(self):
        # reference strips volatile params (hyogo.py:38-41, shimane.py:42-46)
        c = canonicalize("http://x.jp/p?b=2&utm_source=tw&a=1")
        assert c == "http://x.jp/p?a=1&b=2"

    def test_sha1_and_host(self):
        u = "http://example.jp/a"
        assert url_sha1(u) == hashlib.sha1(u.encode()).digest()
        assert host_of(u) == "example.jp"

    def test_batch(self):
        canon, sha, hosts = canonicalize_batch(["/a", "/b"], ["http://h1.jp/x", "http://h2.jp/y"])
        assert canon == ["http://h1.jp/a", "http://h2.jp/b"]
        assert hosts == ["h1.jp", "h2.jp"]
        assert sha[0] == hashlib.sha1(b"http://h1.jp/a").digest()


class TestBloom:
    def test_no_false_negatives(self):
        b = BlockedBloom(10_000)
        keys = _keys(10_000)
        b.add(keys)
        assert b.contains(keys).all()

    def test_false_positive_rate(self):
        b = BlockedBloom(10_000)
        b.add(_keys(10_000, seed=1))
        fp = b.contains(_keys(20_000, seed=2)).mean()
        assert fp < 0.02, f"blocked bloom fp rate {fp:.4f} too high"

    def test_roundtrip(self):
        b = BlockedBloom(1000)
        keys = _keys(500, seed=3)
        b.add(keys)
        b2 = BlockedBloom.from_bytes(b.to_bytes())
        assert (b2.contains(keys) == b.contains(keys)).all()
        assert b2.contains(keys).all()


class TestCuckoo:
    def test_insert_contains_delete(self):
        c = CuckooFilter(5000)
        keys = _keys(4000, seed=4)
        c.add(keys)
        assert c.contains(keys).all()
        # delete half, they must disappear
        dropped = c.delete(keys[:2000])
        assert dropped.all()
        assert not c.contains(keys[:2000]).any() or c.contains(keys[:2000]).mean() < 0.01
        assert c.contains(keys[2000:]).all()

    def test_false_positive_rate(self):
        c = CuckooFilter(10_000)
        c.add(_keys(9000, seed=5))
        fp = c.contains(_keys(20_000, seed=6)).mean()
        assert fp < 0.005, f"cuckoo fp rate {fp:.4f}"

    def test_roundtrip(self):
        c = CuckooFilter(1000)
        keys = _keys(800, seed=7)
        c.add(keys)
        c2 = CuckooFilter.from_bytes(c.to_bytes())
        assert c2.contains(keys).all()
        assert c2.count == c.count


class TestSeenShard:
    def test_first_discovery_wins(self):
        s = SeenShard(10_000)
        keys = _keys(1000, seed=8)
        novel1 = s.admit(keys)
        assert novel1.all()
        novel2 = s.admit(keys)
        assert not novel2.any()

    def test_within_batch_dedup(self):
        s = SeenShard(1000)
        keys = np.vstack([_keys(10, seed=9)] * 3)  # each key 3x
        novel = s.admit(keys)
        assert novel.sum() == 10
        assert novel[:10].all() and not novel[10:].any()

    def test_delete_readmits(self):
        s = SeenShard(1000)
        keys = _keys(50, seed=10)
        s.admit(keys)
        s.delete(keys[:10])
        novel = s.admit(keys)
        assert novel[:10].all() and not novel[10:].any()

    def test_checkpoint_restore(self):
        s = SeenShard(1000)
        keys = _keys(500, seed=11)
        s.admit(keys)
        s2 = SeenShard.restore(s.checkpoint())
        assert not s2.admit(keys).any()
        assert s2.size() == s.size()

    def test_packed_bytes_api(self):
        s = SeenShard(1000)
        keys = _keys(100, seed=12)
        assert s.admit(keys.tobytes()).all()
        assert s.contains(keys.tobytes()).all()


class TestShardedSeenSet:
    def test_local_shards(self):
        shards = [SeenShard(10_000) for _ in range(4)]
        sset = ShardedSeenSet(shards)
        keys = _keys(2000, seed=13)
        assert sset.admit(keys).all()
        assert not sset.admit(keys).any()
        assert sset.contains(keys).all()
        # routing is stable
        sid = shard_of(keys, 4)
        assert (sid == shard_of(keys, 4)).all()
        assert set(np.unique(sid)) <= {0, 1, 2, 3}

    def test_remote_shards(self, ray_session):
        import ray

        from goto_eater_crawler_ray.state.seen import make_shard_actors

        actors = make_shard_actors(2, 10_000)
        sset = ShardedSeenSet(actors)
        keys = _keys(500, seed=14)
        assert sset.admit(keys).all()
        assert not sset.admit(keys).any()
        blobs = sset.checkpoint_all()
        restored = make_shard_actors(2, 10_000, restore_blobs=blobs)
        sset2 = ShardedSeenSet(restored)
        assert not sset2.admit(keys).any()
        for a in actors + restored:
            ray.kill(a)


class TestRobots:
    DISALLOW_ALL = "User-agent: *\nDisallow: /\n"
    MIXED = "User-agent: goto-eater-crawler\nDisallow: /private/\nCrawl-delay: 2\n\nUser-agent: *\nDisallow: /\n"

    def test_disallow_all(self):
        dis, cd = parse_robots(self.DISALLOW_ALL)
        assert not robots_allowed("/anything", dis)

    def test_specific_ua_overrides(self):
        dis, cd = parse_robots(self.MIXED)
        assert robots_allowed("/public/x", dis)
        assert not robots_allowed("/private/x", dis)
        assert cd == 2.0

    def test_empty(self):
        dis, cd = parse_robots("")
        assert robots_allowed("/x", dis)
        assert cd is None

    def test_allow_longest_match_precedence(self):
        # full REP: Disallow:/ + Allow:/public/ admits /public/* (the
        # protego/Scrapy behavior the reference relies on)
        rules, _ = parse_robots("User-agent: *\nDisallow: /\nAllow: /public/\n")
        assert robots_allowed("/public/x", rules)
        assert not robots_allowed("/private/x", rules)
        # deeper disallow inside an allowed subtree wins by length
        rules2, _ = parse_robots("User-agent: *\nAllow: /a/\nDisallow: /a/secret/\n")
        assert robots_allowed("/a/ok", rules2)
        assert not robots_allowed("/a/secret/x", rules2)
        # exact length tie -> allow wins
        rules3, _ = parse_robots("User-agent: *\nDisallow: /tie/\nAllow: /tie/\n")
        assert robots_allowed("/tie/x", rules3)

    def test_wildcard_and_anchor_rules(self):
        # RFC 9309 '*' / '$' wildcards, as protego honors them: a rule like
        # 'Disallow: /*.pdf$' must block pdf paths, not be a dead literal
        rules, _ = parse_robots("User-agent: *\nDisallow: /*.pdf$\n")
        assert not robots_allowed("/docs/report.pdf", rules)
        assert robots_allowed("/docs/report.pdf?x=1", rules)  # $ anchors the end
        assert robots_allowed("/docs/report.html", rules)
        # mid-path '*': /shops*/private blocks /shops123/private
        rules2, _ = parse_robots("User-agent: *\nDisallow: /shop*/private\n")
        assert not robots_allowed("/shop123/private/x", rules2)
        assert robots_allowed("/shop123/public", rules2)
        # wildcard disallow + longer literal allow still follows precedence
        rules3, _ = parse_robots("User-agent: *\nDisallow: /a/*.php\nAllow: /a/open/index.php\n")
        assert robots_allowed("/a/open/index.php", rules3)
        assert not robots_allowed("/a/x.php", rules3)


class TestPoliteness:
    def test_per_host_serialization_and_delay(self):
        sched = PolitenessScheduler(default_delay=3.0)
        hosts = ["a.jp"] * 3 + ["b.jp"] * 2
        paths = ["/1", "/2", "/3", "/1", "/2"]
        out = sched.schedule(hosts, paths, np.zeros(5, dtype=int), np.arange(5))
        assert out["allowed"].all()
        # a.jp visits serialized 3s apart
        a_ts = sorted(out["sched_ts"][:3])
        assert a_ts == [0.0, 3.0, 6.0]
        assert sorted(out["visit_seq"][:3]) == [0, 1, 2]
        # b.jp independent clock
        assert sorted(out["sched_ts"][3:]) == [0.0, 3.0]

    def test_depth_before_discovery(self):
        # heap order (depth, host-budget, discovery-time): lower depth first
        sched = PolitenessScheduler(default_delay=1.0)
        out = sched.schedule(
            ["h.jp"] * 4,
            ["/a", "/b", "/c", "/d"],
            np.array([1, 0, 1, 0]),
            np.array([0.0, 1.0, 2.0, 3.0]),
        )
        # depth-0 rows (/b, /d) get visit_seq 0,1; depth-1 (/a, /c) get 2,3
        assert list(out["visit_seq"]) == [2, 0, 3, 1]

    def test_robots_gate(self):
        sched = PolitenessScheduler()
        sched.configure([{"host": "x.jp", "crawl_delay_s": 1.0, "robots_txt": "User-agent: *\nDisallow: /\n"}])
        out = sched.schedule(["x.jp", "y.jp"], ["/a", "/a"], np.zeros(2, dtype=int), np.zeros(2))
        assert not out["allowed"][0]
        assert out["allowed"][1]
        assert out["visit_seq"][0] == -1

    def test_configure_delay_overrides(self):
        # reference per-site overrides (chiba 1.25s etc., SURVEY §2.5)
        sched = PolitenessScheduler(default_delay=3.0)
        sched.configure([{"host": "chiba.jp", "crawl_delay_s": 1.25, "robots_txt": ""}])
        out = sched.schedule(["chiba.jp"] * 2, ["/1", "/2"], np.zeros(2, dtype=int), np.arange(2))
        assert sorted(out["sched_ts"]) == [0.0, 1.25]

    def test_checkpoint_restore_continues_clock(self):
        sched = PolitenessScheduler(default_delay=2.0)
        sched.schedule(["h.jp"] * 2, ["/1", "/2"], np.zeros(2, dtype=int), np.arange(2))
        restored = PolitenessScheduler.restore(sched.checkpoint())
        out = restored.schedule(["h.jp"], ["/3"], np.zeros(1, dtype=int), np.zeros(1))
        assert out["sched_ts"][0] == 4.0
        assert out["visit_seq"][0] == 2


class TestFetchWorkerActorPool:
    def test_actor_pool_fetch(self, ray_session):
        """The actor-pool fetch form (stages/fetch.py): callable class via
        map_batches(Cls, concurrency=N) — setup once per actor."""
        import ray.data as rd

        from goto_eater_crawler_ray.sources.pagestore import ScaleSpec
        from goto_eater_crawler_ray.stages.fetch import FetchWorker

        rows = [
            {
                "url": f"http://paginated0.example.jp/list?page={p}",
                "method": "GET",
                "form_json": "",
                "sched_ts": float(p),
            }
            for p in range(1, 5)
        ]
        ds = rd.from_items(rows).map_batches(
            FetchWorker,
            fn_constructor_kwargs={"scale_spec": ScaleSpec.golden()},
            batch_format="pyarrow",
            concurrency=1,
            batch_size=2,
        )
        out = ds.take_all()
        assert all(r["status"] in (200, 503) for r in out)
        ok = [r for r in out if r["status"] == 200]
        assert ok and all(len(r["body"]) > 100 for r in ok)
        assert all(r["fetched_at"] >= r["sched_ts"] for r in out)


class TestLeaseCommit:
    def test_lease_then_commit_roundtrip(self):
        sched = PolitenessScheduler(default_delay=2.0)
        sched.configure([{"host": "h.jp", "crawl_delay_s": 1.5, "robots_txt": "User-agent: *\nDisallow: /priv/\n"}])
        lease = sched.lease_hosts(["h.jp", "fresh.jp"])
        assert lease["h.jp"]["crawl_delay"] == 1.5
        assert lease["h.jp"]["rules"] == [("/priv/", False)]
        assert lease["fresh.jp"]["crawl_delay"] == 2.0  # default
        # chain follower advances locally, commits back
        sched.commit_hosts({"h.jp": {"visit_count": 7, "next_free_ts": 10.5}})
        out = sched.schedule(["h.jp"], ["/a"], np.zeros(1, dtype=int), np.zeros(1))
        assert out["visit_seq"][0] == 7
        assert out["sched_ts"][0] == 10.5

    def test_lease_survives_checkpoint(self):
        sched = PolitenessScheduler()
        sched.commit_hosts({"x.jp": {"visit_count": 3, "next_free_ts": 9.0}})
        restored = PolitenessScheduler.restore(sched.checkpoint())
        lease = restored.lease_hosts(["x.jp"])
        assert lease["x.jp"]["visit_count"] == 3
        assert lease["x.jp"]["next_free_ts"] == 9.0


class TestShardRoutingIndependence:
    def test_sharded_capacity_not_collapsed(self):
        """Regression: shard routing must be independent of the bloom/cuckoo
        internal bits — correlated routing collapses per-shard bucket space
        to 1/n_shards and overflows far below design capacity."""
        shards = [SeenShard(100_000) for _ in range(4)]
        sset = ShardedSeenSet(shards)
        keys = _keys(400_000, seed=99)  # exactly design load across 4 shards
        novel = sset.admit(keys)  # would raise 'cuckoo filter full' if correlated
        assert novel.sum() == len(np.unique(keys.view([("", np.uint8)] * 20)))


class TestBackoffDeterminism:
    def test_backoff_stable_across_hash_seeds(self):
        import subprocess
        import sys

        code = "from goto_eater_crawler_ray.stages.fetch import _backoff_s; print(_backoff_s(3, 'http://x.jp/a'))"
        outs = {
            subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True, env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin", "HOME": "/root"}, cwd="/root/repo"
            ).stdout.strip()
            for seed in ("0", "12345")
        }
        assert len(outs) == 1, f"backoff differs across hash seeds: {outs}"
