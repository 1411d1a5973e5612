"""Per-host politeness scheduler: robots.txt, crawl-delay budgets, visit order.

Reference semantics being reproduced (SURVEY.md §2.5, §4.1):
  - strict per-host serialization (CONCURRENT_REQUESTS_PER_DOMAIN=1,
    reference: goto_eat_scrapy/settings.py:34),
  - per-host crawl delay (DOWNLOAD_DELAY=3 default, per-spider overrides
    1-4 s, settings.py:32 + spider custom_settings),
  - robots.txt obeyed (ROBOTSTXT_OBEY, settings.py:21; the kochi spider is
    excluded because robots disallows, main.py:32),
  - visit order = priority heap by (depth, host-budget, discovery-time)
    (BASELINE.json north_rule).

The scheduler keeps a *virtual clock* per host: ``next_free_ts`` advances by
``crawl_delay`` per scheduled fetch.  This makes visit order deterministic
and testable without wall-clock sleeps; the simulated fetch layer turns the
virtual schedule into (scaled) latency.  Sharding: hosts are hash-routed to
scheduler shards, so ALL requests for one host serialize through one shard
actor even when the fetch/parse stages are salted across partitions for a
mega-host (SURVEY.md §7.4).

``PolitenessScheduler`` is a plain class (unit-testable Ray-free); wrap
with ``ray.remote`` for the engine.  Checkpointable to bytes.
"""

from __future__ import annotations

import pickle
import re
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np

DEFAULT_CRAWL_DELAY = 3.0  # reference settings.py:32


@lru_cache(maxsize=4096)
def _rule_matcher(prefix: str):
    """RFC 9309 wildcard support: ``None`` for plain prefixes (fast
    startswith path); a compiled regex when the rule uses ``*`` (any
    sequence) or a trailing ``$`` (end anchor) — so 'Disallow: /*.pdf$'
    blocks what protego/Scrapy would block instead of being treated as a
    literal prefix that never matches.  Cached per pattern string so rules
    arriving through lease dicts don't recompile per call."""
    if "*" not in prefix and not prefix.endswith("$"):
        return None
    pat = re.escape(prefix).replace(r"\*", ".*")
    if pat.endswith(r"\$"):
        pat = pat[:-2] + "$"
    return re.compile(pat)


def parse_robots(robots_txt: str, user_agent: str = "goto-eater-crawler") -> tuple[list[tuple[str, bool]], float | None]:
    """robots.txt parse -> (rules for our UA, crawl-delay).

    Rules are (prefix, is_allow) pairs — BOTH Allow and Disallow lines are
    stored, and :func:`robots_allowed` applies standard REP longest-match
    precedence (so 'Disallow: /' + 'Allow: /public/' admits /public/*, as
    protego/Scrapy does for the reference).  Groups are matched for exact
    UA or '*'; a specific-UA group overrides '*'.  Empty Disallow = allow
    all (no rule stored)."""
    groups: dict[str, tuple[list[tuple[str, bool]], float | None]] = {}
    current_agents: list[str] = []
    pending_new_group = True
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if pending_new_group:
                current_agents = []
                pending_new_group = False
            current_agents.append(val.lower())
            for a in current_agents:
                groups.setdefault(a, ([], None))
        elif key in ("disallow", "allow", "crawl-delay"):
            pending_new_group = True
            for a in current_agents:
                rules, cd = groups.get(a, ([], None))
                if key in ("disallow", "allow") and val:
                    rules = rules + [(val, key == "allow")]
                elif key == "crawl-delay":
                    try:
                        cd = float(val)
                    except ValueError:
                        pass
                groups[a] = (rules, cd)
    ua = user_agent.lower()
    if ua in groups:
        return groups[ua]
    return groups.get("*", ([], None))


def robots_allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    """Standard REP precedence (RFC 9309): the most-specific (longest
    pattern) matching rule wins; on a length tie Allow wins
    (least-restrictive).  Rules may use '*' / '$' wildcards (matched via
    :func:`_rule_matcher`).  No matching rule -> allowed.  Also accepts
    the legacy plain-string form (a bare disallow-prefix list)."""
    best_len, best_allow = -1, True
    for rule in rules:
        prefix, is_allow = rule if isinstance(rule, tuple) else (rule, False)
        rx = _rule_matcher(prefix)
        if rx.match(path) if rx is not None else path.startswith(prefix):
            ln = len(prefix)
            if ln > best_len or (ln == best_len and is_allow):
                best_len, best_allow = ln, is_allow
    return best_allow


@dataclass
class HostState:
    crawl_delay: float = DEFAULT_CRAWL_DELAY
    rules: list[tuple[str, bool]] = field(default_factory=list)  # (prefix, is_allow)
    next_free_ts: float = 0.0  # virtual clock
    visit_count: int = 0  # per-host visit_seq counter
    is_mega: bool = False


class PolitenessScheduler:
    """One shard of the politeness control plane (hosts hash-routed here)."""

    def __init__(self, default_delay: float = DEFAULT_CRAWL_DELAY, user_agent: str = "goto-eater-crawler"):
        self.default_delay = default_delay
        self.user_agent = user_agent
        self.hosts: dict[str, HostState] = {}

    def configure(self, rows: list[dict]) -> int:
        """Load the per-host budget table (FIXTURES.md §6):
        {host, crawl_delay_s, robots_txt, is_mega_host}."""
        for r in rows:
            dis, robots_delay = parse_robots(r.get("robots_txt") or "", self.user_agent)
            delay = r.get("crawl_delay_s")
            if delay is None:
                delay = robots_delay if robots_delay is not None else self.default_delay
            st = self.hosts.setdefault(r["host"], HostState())
            st.crawl_delay = float(delay)
            st.rules = dis
            st.is_mega = bool(r.get("is_mega_host", False))
        return len(self.hosts)

    def _state(self, host: str) -> HostState:
        st = self.hosts.get(host)
        if st is None:
            st = HostState(crawl_delay=self.default_delay)
            self.hosts[host] = st
        return st

    def schedule(
        self,
        hosts: list[str],
        paths: list[str],
        depths: np.ndarray,
        discovered_at: np.ndarray,
    ) -> dict:
        """Assign visit order + virtual fetch times to a frontier batch.

        Ordering per host = priority heap (depth, host-budget=next_free_ts
        at admission, discovery-time) — north_rule.  Returns dict of numpy
        arrays aligned with the input: ``allowed`` (robots), ``visit_seq``
        (per-host, -1 if disallowed), ``sched_ts`` (virtual fetch time).
        """
        n = len(hosts)
        allowed = np.ones(n, dtype=bool)
        visit_seq = np.full(n, -1, dtype=np.int64)
        sched_ts = np.full(n, -1.0, dtype=np.float64)
        depths = np.asarray(depths)
        discovered_at = np.asarray(discovered_at)

        # one numpy pass per HOST via sort-based grouping (O(n log n) total;
        # a per-host equality scan would be O(hosts x rows))
        host_arr = np.asarray(hosts, dtype=object)
        order_by_host = np.argsort(host_arr, kind="stable")
        sorted_hosts = host_arr[order_by_host]
        boundaries = np.flatnonzero(np.concatenate(([True], sorted_hosts[1:] != sorted_hosts[:-1])))
        groups = {str(sorted_hosts[b]): order_by_host[b:e] for b, e in zip(boundaries, np.append(boundaries[1:], len(sorted_hosts)))}
        for host, idxs in groups.items():
            st = self._state(host)
            if st.rules:
                ok = np.array([robots_allowed(paths[i], st.rules) for i in idxs])
                allowed[idxs[~ok]] = False
                idxs = idxs[ok]
            if len(idxs) == 0:
                continue
            # heap order: (depth, host-budget-at-admission, discovery-time);
            # budget is constant within one schedule call -> (depth, disc)
            order = np.lexsort((discovered_at[idxs], depths[idxs]))
            live = idxs[order]
            n_live = len(live)
            visit_seq[live] = st.visit_count + np.arange(n_live)
            sched_ts[live] = st.next_free_ts + np.arange(n_live) * st.crawl_delay
            st.visit_count += n_live
            st.next_free_ts += n_live * st.crawl_delay
        return {"allowed": allowed, "visit_seq": visit_seq, "sched_ts": sched_ts}

    def lease_hosts(self, hosts: list[str]) -> dict:
        """Chain-follower lease: hand the host's clock + robots to the ONE
        task that owns this host's frontier row this wave (exclusivity is
        by construction: chain rows are unique per host).  The task runs
        the per-host serial chain locally and commits the advanced clock
        back — one RPC per host per wave instead of one per page."""
        out = {}
        for h in set(hosts):
            st = self._state(h)
            out[h] = {
                "visit_count": st.visit_count,
                "next_free_ts": st.next_free_ts,
                "crawl_delay": st.crawl_delay,
                "rules": list(st.rules),
            }
        return out

    def commit_hosts(self, updates: dict) -> bool:
        for h, u in updates.items():
            st = self._state(h)
            st.visit_count = int(u["visit_count"])
            st.next_free_ts = float(u["next_free_ts"])
        return True

    def host_budgets(self) -> dict[str, float]:
        return {h: s.next_free_ts for h, s in self.hosts.items()}

    # --- checkpoint ----------------------------------------------------
    def checkpoint(self) -> bytes:
        return pickle.dumps(
            {
                "default_delay": self.default_delay,
                "user_agent": self.user_agent,
                "hosts": self.hosts,
            }
        )

    def _restore_inplace(self, blob: bytes) -> bool:
        d = pickle.loads(blob)
        self.default_delay = d["default_delay"]
        self.user_agent = d["user_agent"]
        self.hosts = d["hosts"]
        return True

    @classmethod
    def restore(cls, blob: bytes) -> "PolitenessScheduler":
        obj = cls()
        obj._restore_inplace(blob)
        return obj
