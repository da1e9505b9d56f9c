"""Single-threaded pure-Python oracle of the frontier engine.

Implements the reference scheduler semantics directly (heap-free,
list-sorted — fine at test scale): same decision table, same ordering
(priority DESC, seq ASC), same token-bucket budgets, same deterministic
seq formula, same robots gating, same extraction functions.  The Spark
engine must reproduce this oracle's selected-set *and order* per epoch,
and its final URL-seen membership (BASELINE.json north_rule: "matching
the reference's crawl ordering and URL-seen set under the same seed
list + politeness budget").
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from crawler_pyspider_spark.functions.extract import decode_html, extract_links_py
from crawler_pyspider_spark.functions.urls import canonicalize_url_py
from crawler_pyspider_spark.operators.frontier import (
    ACTIVE, BAD, FAILED, SUCCESS,
    DEFAULT_AGE, DEFAULT_PRIORITY, DEFAULT_RETRIES,
    LEASE_SECONDS, RETRY_DELAYS, RETRY_DELAY_DEFAULT,
)


def md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def host_of(url: str) -> str:
    from urllib.parse import urlsplit

    return urlsplit(url).netloc


@dataclass
class OTask:
    taskid: str
    project: str
    url: str
    host: str
    status: int = ACTIVE
    priority: int = DEFAULT_PRIORITY
    retries: int = DEFAULT_RETRIES
    retried: int = 0
    exetime: float = 0.0
    age: int = DEFAULT_AGE
    itag: str | None = None
    force_update: bool = False
    auto_recrawl: bool = False
    cancel: bool = False
    callback: str = "index_page"
    lastcrawltime: float | None = None
    seq: int = 0
    lease_expires: float | None = None


@dataclass
class OracleEngine:
    pages: dict  # url -> html bytes
    robots: dict  # host -> [disallow prefixes]
    politeness: dict  # host -> (rate, burst)
    handler: object  # engine.Handler
    project: str = "bench"
    epoch_interval: float = 1.0
    loop_limit: int = 1000
    inqueue_limit: int | None = None
    base_ts: float = 1704067200.0
    default_rate: float = 1.0
    default_burst: float = 10.0

    tasks: dict = field(default_factory=dict)  # (project, taskid) -> OTask
    tokens: dict = field(default_factory=dict)  # host -> (tokens, last_update)
    pending: list = field(default_factory=list)
    epoch: int = -1
    selected_log: list = field(default_factory=list)
    results: list = field(default_factory=list)

    def seed(self, urls_with_prio: list) -> None:
        """urls_with_prio: [(url, priority)] in seed order."""
        for i, (url, prio) in enumerate(
            sorted(urls_with_prio, key=lambda x: x[0])
        ):
            self.pending.append(
                dict(url=url, priority=prio, callback="index_page", seq=i + 1)
            )

    # -- ingest -------------------------------------------------------------
    def _ingest(self, now: float) -> None:
        batch = sorted(self.pending, key=lambda d: d["seq"])
        self.pending = []
        seen_batch: dict = {}
        for req in batch:
            canon = canonicalize_url_py(req["url"])
            taskid = md5hex(canon)
            cb = req.get("callback", "index_page")
            cfg = self.handler.callbacks.get(cb)
            cfgd = cfg.config if cfg else {}
            t = OTask(
                taskid=taskid,
                project=self.project,
                url=canon,
                host=host_of(canon),
                priority=req.get("priority") if req.get("priority") is not None else cfgd.get("priority", DEFAULT_PRIORITY),
                age=cfgd.get("age", DEFAULT_AGE),
                retries=cfgd.get("retries", DEFAULT_RETRIES),
                itag=cfgd.get("itag"),
                auto_recrawl=cfgd.get("auto_recrawl", False),
                exetime=req.get("exetime", 0.0) or 0.0,
                force_update=req.get("force_update", False),
                cancel=req.get("cancel", False),
                callback=cb,
                seq=req["seq"],
            )
            key = (t.project, t.taskid)
            prev = seen_batch.get(key)
            if prev is not None and not t.force_update:
                continue  # first-wins within batch
            seen_batch[key] = t

        n_active = sum(
            1 for v in self.tasks.values() if v.status == ACTIVE
        )
        admitted = 0
        for key, t in sorted(seen_batch.items(), key=lambda kv: kv[1].seq):
            if self.inqueue_limit and n_active + admitted >= self.inqueue_limit:
                continue
            old = self.tasks.get(key)
            if old is None:
                self.tasks[key] = t
                admitted += 1
                continue
            in_flight = old.lease_expires is not None and old.lease_expires > now
            if t.force_update and in_flight:
                # postpone (scheduler.py:855-861)
                self.pending.append(
                    dict(url=t.url, priority=t.priority, callback=t.callback, seq=t.seq)
                )
                continue
            itag_changed = t.itag is not None and t.itag != old.itag
            age_expired = t.age >= 0 and t.age + (old.lastcrawltime or 0) < now
            restart = itag_changed or age_expired or t.force_update
            if not restart:
                continue
            t.lease_expires = old.lease_expires
            t.status = BAD if t.cancel else ACTIVE
            self.tasks[key] = t

    # -- select -------------------------------------------------------------
    def _budget(self, host: str, now: float) -> tuple[float, float, float]:
        rate, burst = self.politeness.get(host, (self.default_rate, self.default_burst))
        tokens, last = self.tokens.get(host, (burst, now))
        tokens = min(burst, tokens + rate * (now - last))
        return tokens, rate, burst

    def _select(self, now: float) -> list[OTask]:
        ready = [
            t
            for t in self.tasks.values()
            if t.status == ACTIVE
            and t.exetime <= now
            and (t.lease_expires is None or t.lease_expires <= now)
        ]
        by_host: dict = {}
        for t in ready:
            by_host.setdefault(t.host, []).append(t)
        picked = []
        used: dict = {}
        for host, ts in by_host.items():
            tokens, rate, burst = self._budget(host, now)
            budget = int(tokens)
            ts.sort(key=lambda t: (-t.priority, t.seq))
            take = ts[: max(budget, 0)]
            picked.extend(take)
            used[host] = (tokens, len(take))
        picked.sort(key=lambda t: (-t.priority, t.seq))
        picked = picked[: self.loop_limit]
        # token debit only for actually-selected tasks
        counts: dict = {}
        for t in picked:
            counts[t.host] = counts.get(t.host, 0) + 1
        for host, (tokens, _) in used.items():
            self.tokens[host] = (tokens - counts.get(host, 0), now)
        for t in picked:
            t.lease_expires = now + LEASE_SECONDS
        return picked

    # -- fetch + process ----------------------------------------------------
    def _fetch_process(self, selected: list[OTask], now: float) -> None:
        parents = []
        for t in selected:
            prefixes = self.robots.get(t.host, [])
            from urllib.parse import urlsplit

            path = urlsplit(t.url).path or "/"
            if any(path.startswith(p) for p in prefixes):
                code = 403
            elif t.url in self.pages:
                code = 200
            else:
                code = 404
            cb = self.handler.callbacks.get(t.callback)
            if code == 200:
                text = decode_html(self.pages[t.url])
                if cb and cb.emit_result:
                    self.results.append((t.taskid, t.url))
                if cb and cb.extract_links:
                    parents.append((t, text))
                self._done(t, now)
            else:
                self._failed(t, now)
        # follows: parent_rank over ok link-emitting parents ordered by seq
        parents.sort(key=lambda pt: pt[0].seq)
        for rank, (t, text) in enumerate(parents, start=1):
            cb = self.handler.callbacks[t.callback]
            links = extract_links_py(text, t.url)
            for idx, link in enumerate(links):
                self.pending.append(
                    dict(
                        url=link,
                        priority=None,
                        callback=cb.link_callback,
                        seq=(self.epoch + 1) * 1_000_000_000 + rank * 10_000 + idx,
                    )
                )

    def _done(self, t: OTask, now: float) -> None:
        t.lease_expires = None
        t.lastcrawltime = now
        if t.auto_recrawl and t.age >= 0:
            t.status = ACTIVE
            t.exetime = now + t.age
        else:
            t.status = SUCCESS

    def _failed(self, t: OTask, now: float) -> None:
        t.lease_expires = None
        next_exe = (
            RETRY_DELAYS[t.retried] if t.retried < len(RETRY_DELAYS) else RETRY_DELAY_DEFAULT
        )
        if t.auto_recrawl and t.age >= 0:
            next_exe = min(next_exe, t.age)
        elif t.retried >= t.retries:
            next_exe = -1
        elif t.age >= 0 and next_exe > t.age:
            next_exe = t.age
        t.lastcrawltime = now
        if next_exe < 0:
            t.status = FAILED
        else:
            t.retried += 1
            t.exetime = now + next_exe
            t.status = ACTIVE

    # -- loop ---------------------------------------------------------------
    def run_epoch(self) -> list[str]:
        self.epoch += 1
        now = self.base_ts + (self.epoch + 1) * self.epoch_interval
        self._ingest(now)
        selected = self._select(now)
        self.selected_log.append([t.url for t in selected])
        self._fetch_process(selected, now)
        return [t.url for t in selected]

    def seen_urls(self) -> set:
        return {t.url for t in self.tasks.values()}
