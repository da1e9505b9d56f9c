"""CrawlEngine — the deterministic epoch loop.

One epoch = one pass of the reference scheduler's ``run_once``
(scheduler.py:662-672: ``_check_task_done`` + ``_check_request`` +
``_check_select``) plus the fetcher and processor stages, set-at-a-time:

    ingest   union(seeds, follows, deferred) -> canonicalize ->
             within-batch dedup -> INQUEUE_LIMIT -> new/old decision
             table -> MERGE frontier                         (§3.1 step 2)
    select   ready filter -> politeness-budgeted window rank ->
             lease stamp -> token-state update               (step 3)
    fetch    broadcast robots gate -> join against the pages table
             (the sandbox "web"; production: mapInPandas async HTTP)
                                                             (step 4)
    process  one-pass parse_page pandas UDF -> follows (posexplode) +
             results + status pack                           (step 5)
    close    SUCCESS / retry-ladder fold into frontier       (step 6)
    commit   frontier, token state, pending follows, results delta,
             metrics -> atomic snapshot; resume restarts here

No wall-clock anywhere: ``now = base_ts + epoch · interval``.  The
follow sequence number is ``epoch·1e9 + parent_rank·1e4 + link_index``
(deterministic replacement for the reference's global AtomInt,
task_queue.py:28-38), so crawl ordering is reproducible and comparable
against the single-threaded oracle in tests.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_pyspider_spark.checkpoint import SnapshotStore
from crawler_pyspider_spark.functions.extract import parse_page
from crawler_pyspider_spark.functions.urls import with_url_identity
from crawler_pyspider_spark.operators import frontier as FR
from crawler_pyspider_spark.operators import seenset
from crawler_pyspider_spark.operators.robots import robots_gate

BASE_EPOCH_TS = 1704067200.0  # 2024-01-01T00:00:00Z — fixture base time


# --------------------------------------------------------------------------
# handler spec — the declarative form of a pyspider handler class
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Callback:
    """One handler callback (base_handler.py:161-219 dispatch target).

    ``config`` mirrors the ``@config`` decorator (base_handler.py:50-62,
    J4): schedule defaults applied to crawls *targeting* this callback.
    """

    extract_links: bool = False
    link_callback: str | None = None
    emit_result: bool = False
    config: dict = field(default_factory=dict)


@dataclass(frozen=True)
class Handler:
    """Declarative handler: callback name -> Callback spec."""

    callbacks: dict

    def link_emitters(self) -> list[str]:
        return [n for n, c in self.callbacks.items() if c.extract_links]

    def result_emitters(self) -> list[str]:
        return [n for n, c in self.callbacks.items() if c.emit_result]


# libs/sample_handler.py:9-27 — on_start -> index_page -> detail_page
SAMPLE_HANDLER = Handler(
    callbacks={
        "on_start": Callback(extract_links=True, link_callback="index_page"),
        "index_page": Callback(
            extract_links=True,
            link_callback="detail_page",
            config={"age": 10 * 24 * 60 * 60},
        ),
        "detail_page": Callback(emit_result=True, config={"priority": 2}),
    }
)

# libs/bench.py:256-265 — index_page follows itself, returns response.url
BENCH_HANDLER = Handler(
    callbacks={
        "on_start": Callback(extract_links=True, link_callback="index_page"),
        "index_page": Callback(
            extract_links=True, link_callback="index_page", emit_result=True
        ),
    }
)


def _callback_case(handler: Handler, key: str, dtype: str, default):
    """CASE expression mapping callback name -> @config value for `key`."""
    expr = F.lit(default).cast(dtype)
    for name, cb in handler.callbacks.items():
        if key in cb.config:
            expr = F.when(
                F.col("callback") == name, F.lit(cb.config[key]).cast(dtype)
            ).otherwise(expr)
    return expr


# --------------------------------------------------------------------------
# engine
# --------------------------------------------------------------------------


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame,
        politeness: DataFrame,
        warehouse: str,
        handler: Handler = BENCH_HANDLER,
        project: str = "bench",
        epoch_interval: float = 1.0,
        loop_limit: int = FR.LOOP_LIMIT,
        inqueue_limit: int | None = None,
        n_host_buckets: int = 1024,
        n_salts: int = 8,
        salt_threshold: int = 10000,
        base_ts: float = BASE_EPOCH_TS,
        seen_filter: str = "exact",
        seen_shards_n: int = seenset.DEFAULT_SHARDS,
        seen_bits: int = seenset.DEFAULT_BITS,
        seen_k: int = seenset.DEFAULT_K,
    ):
        self.spark = spark
        self.pages = pages
        self.robots = robots
        self.politeness = politeness
        self.store = SnapshotStore(spark, warehouse)
        self.handler = handler
        self.project = project
        self.epoch_interval = epoch_interval
        self.loop_limit = loop_limit
        self.inqueue_limit = inqueue_limit
        self.n_host_buckets = n_host_buckets
        self.n_salts = n_salts
        self.salt_threshold = salt_threshold
        self.base_ts = base_ts
        if seen_filter not in ("exact", "bloom"):
            raise ValueError(f"seen_filter must be 'exact' or 'bloom', got {seen_filter!r}")
        self.seen_filter = seen_filter
        self.seen_shards_n = seen_shards_n
        self.seen_bits = seen_bits
        self.seen_k = seen_k
        # bloom tier (SURVEY §4): membership pre-filter in front of the
        # frontier merge join; bloom-negative URLs append without a join
        self.seen_shards: DataFrame | None = (
            seenset.empty_shards(spark, seen_shards_n, seen_bits)
            if seen_filter == "bloom"
            else None
        )

        self.epoch: int = -1
        self.frontier: DataFrame = FR.empty_frontier(spark)
        self.token_state: DataFrame = FR.empty_token_state(spark)
        self.pending: DataFrame | None = None  # follows + deferred for next epoch
        self._pending_rows: int | None = None  # known size of self.pending
        self.metrics: list[dict] = []

    # -- time --------------------------------------------------------------
    def now(self, epoch: int | None = None) -> float:
        e = self.epoch if epoch is None else epoch
        return self.base_ts + (e + 1) * self.epoch_interval

    # -- seeding -----------------------------------------------------------
    def seed(self, seeds: DataFrame, callback: str = "index_page") -> None:
        """Load the initial frontier requests (trigger_on_start analogue,
        scheduler.py:695-704 — seeds play the role of on_start's crawls).

        seeds: (url [, project, priority, exetime]).
        """
        s = seeds
        if "project" not in s.columns:
            s = s.withColumn("project", F.lit(self.project))
        if "priority" not in s.columns:
            s = s.withColumn("priority", F.lit(0))
        s = s.withColumn(
            "exetime",
            F.coalesce(
                F.col("exetime").cast("double") if "exetime" in s.columns else F.lit(None).cast("double"),
                F.lit(0.0),
            ),
        )
        s = s.withColumn("callback", F.lit(callback))
        w = Window.partitionBy(F.lit(1)).orderBy("url")
        s = s.withColumn("seq", F.row_number().over(w).cast("long"))
        self.pending = s.select("url", "project", "priority", "exetime", "callback", "seq")
        self._pending_rows = None  # unknown until first commit

    # -- one epoch ----------------------------------------------------------
    def run_epoch(self) -> dict:
        self.epoch += 1
        now = self.now()
        m: dict = {"epoch": self.epoch, "now": now}
        caches: list[DataFrame] = []

        # ---- ingest (§3.1 step 2) ----
        if self.pending is not None:
            inc = with_url_identity(self.pending, "url", self.n_host_buckets)
            inc = inc.drop("url").withColumnRenamed("url_canon", "url")
            # @config defaults for the target callback (J4)
            for key, dtype, dflt in (
                ("age", "long", FR.DEFAULT_AGE),
                ("priority", "int", FR.DEFAULT_PRIORITY),
                ("retries", "int", FR.DEFAULT_RETRIES),
                ("itag", "string", None),
                ("auto_recrawl", "boolean", False),
            ):
                cfg = _callback_case(self.handler, key, dtype, dflt)
                if key in inc.columns:
                    inc = inc.withColumn(key, F.coalesce(F.col(key).cast(dtype), cfg))
                else:
                    inc = inc.withColumn(key, cfg)
            inc = FR.normalize_incoming(inc, now)
            if self.seen_shards is not None:
                # bloom pre-filter: ONE cogroup pass probes + inserts;
                # bloom-positive rows go through the exact decision
                # join, bloom-negative rows are definitely novel and
                # APPEND to the frontier with no join/shuffle at all
                inc = FR.dedup_batch(inc)
                combined = seenset.probe_combined(
                    inc,
                    self.seen_shards,
                    n_shards=self.seen_shards_n,
                    bits=self.seen_bits,
                    k=self.seen_k,
                ).cache()
                caches.append(combined)
                flagged, self.seen_shards = seenset.split(combined)
                maybe = flagged.filter(F.col("seen")).drop("seen", "shard")
                novel = flagged.filter(~F.col("seen")).drop("seen", "shard")
                merged, deferred = FR.merge_incoming(
                    self.frontier, maybe, now, self.inqueue_limit
                )
                self.frontier = merged.unionByName(novel.select(*FR.FRONTIER_COLS))
            else:
                self.frontier, deferred = FR.merge_incoming(
                    self.frontier, inc, now, self.inqueue_limit
                )
            # deferred (possibly empty) rides along in pending; the
            # commit's footer row count decides next epoch, so no
            # isEmpty/count jobs here
            self.pending = deferred
            m["ingested"] = (
                self._pending_rows if self._pending_rows is not None else inc.count()
            )
        else:
            m["ingested"] = 0

        # ---- select (step 3) ----
        selected, used = FR.select_batch(
            self.frontier,
            self.token_state,
            self.politeness,
            now,
            loop_limit=self.loop_limit,
            n_salts=self.n_salts,
            salt_threshold=self.salt_threshold,
        )
        selected = selected.cache()
        caches.append(selected)
        n_selected = selected.count()
        m["selected"] = n_selected
        self.token_state = FR.update_token_state(self.token_state, used, now)
        self.frontier = FR.upsert(self.frontier, selected)  # record leases (W4)

        results = follows = None
        if n_selected:
            # ---- fetch (step 4): robots gate + join the "web" ----
            gated = robots_gate(selected, self.robots)
            allowed = gated.filter(F.col("robots_allowed"))
            denied = gated.filter(~F.col("robots_allowed"))
            page_side = self.pages.select(
                F.col("url").alias("_p_url"), F.col("html").alias("_p_html")
            )
            # The select batch is the SMALL side (≤ loop_limit rows);
            # broadcast it and stream the pages table map-side — the
            # html payloads (the fat side) are never shuffled.  An
            # outer join cannot preserve the broadcast side, so fetch
            # hits come from an inner broadcast join and 404s from an
            # anti-join against the (cached) hits.
            hit_join = page_side.join(
                F.broadcast(allowed) if n_selected <= 1_000_000 else allowed,
                allowed["url"] == page_side["_p_url"],
                "inner",
            )

            # ---- process (step 5): one-pass parse of the fetched pages ----
            ok = hit_join.withColumn(
                "_parsed", parse_page(F.col("url"), F.col("_p_html"))
            ).drop("_p_url", "_p_html")
            ok = ok.cache()
            caches.append(ok)
            m["fetched_ok"] = ok.count()

            missing = allowed.join(
                F.broadcast(ok.select(F.col("taskid").alias("_ok_taskid"))),
                F.col("taskid") == F.col("_ok_taskid"),
                "left_anti",
            )

            emitters = self.handler.result_emitters()
            if emitters:
                results = ok.filter(F.col("callback").isin(emitters)).select(
                    "taskid",
                    "project",
                    "url",
                    F.to_json(
                        F.struct(F.col("url"), F.col("_parsed.title").alias("title"))
                    ).alias("result"),
                    F.lit(now).alias("updatetime"),
                )

            link_emitters = self.handler.link_emitters()
            if link_emitters:
                # deterministic FIFO rank of this epoch's parents by seq;
                # scalable two-phase rank when the select batch is huge
                # (wide-open bench runs), plain window otherwise
                parents = FR.with_global_rank(
                    ok.filter(F.col("callback").isin(link_emitters)),
                    "_parent_rank",
                    [F.asc("seq")],
                    approx_rows=n_selected,
                )
                lc = F.lit(None).cast("string")
                for name in link_emitters:
                    tgt = self.handler.callbacks[name].link_callback
                    lc = F.when(F.col("callback") == name, F.lit(tgt)).otherwise(lc)
                follows = (
                    parents.select(
                        F.col("_parent_rank"),
                        lc.alias("_link_callback"),
                        F.posexplode(F.col("_parsed.links")).alias("_link_idx", "_link_url"),
                    )
                    .select(
                        F.col("_link_url").alias("url"),
                        F.lit(self.project).alias("project"),
                        F.col("_link_callback").alias("callback"),
                        (
                            F.lit((self.epoch + 1) * 1_000_000_000)
                            + F.col("_parent_rank") * 10_000
                            + F.col("_link_idx")
                        ).cast("long").alias("seq"),
                    )
                    .withColumn("priority", F.lit(None).cast("int"))
                    .withColumn("exetime", F.lit(0.0))
                )

            # ---- close the loop (step 6) ----
            failed = denied.select("project", "taskid").unionByName(
                missing.select("project", "taskid")
            )
            statuses = (
                ok.select("project", "taskid")
                .withColumn("ok", F.lit(True))
                .unionByName(failed.withColumn("ok", F.lit(False)))
            )
            m["robots_denied"] = denied.count()
            m["fetch_missing"] = n_selected - m["fetched_ok"] - m["robots_denied"]
            self.frontier = FR.apply_status(self.frontier, statuses, now)
        else:
            m["fetched_ok"] = m["robots_denied"] = m["fetch_missing"] = 0

        # queue follows (+ any deferred already in pending) for next epoch
        if follows is not None:
            base = self.pending
            self.pending = follows if base is None else base.unionByName(
                follows, allowMissingColumns=True
            )

        # ---- commit (atomic snapshot) ----
        tables = {"frontier": self.frontier, "token_state": self.token_state}
        if self.seen_shards is not None:
            tables["seen_shards"] = self.seen_shards
        if results is not None:
            tables["results"] = results
        if self.pending is not None:
            tables["pending"] = self.pending
        manifest = self.store.write_epoch(self.epoch, tables, counters=m)
        m["n_results"] = manifest["tables"].get("results", {}).get("rows", 0)
        m["n_pending"] = manifest["tables"].get("pending", {}).get("rows", 0)
        m["frontier_rows"] = manifest["tables"]["frontier"]["rows"]

        # reload committed state: truncates lineage AND makes the next
        # epoch start from exactly what a resume would see
        self.frontier = self.store.read("frontier", self.epoch)
        self.token_state = self.store.read("token_state", self.epoch)
        if "seen_shards" in manifest["tables"]:
            self.seen_shards = self.store.read("seen_shards", self.epoch)
        if manifest["tables"].get("pending", {}).get("rows", 0) > 0:
            self.pending = self.store.read("pending", self.epoch)
            self._pending_rows = manifest["tables"]["pending"]["rows"]
        else:
            self.pending = None
            self._pending_rows = 0
        for c in caches:
            c.unpersist()
        self.metrics.append(m)
        return m

    def run(self, epochs: int) -> list[dict]:
        return [self.run_epoch() for _ in range(epochs)]

    # -- resume -------------------------------------------------------------
    @classmethod
    def resume(cls, spark, pages, robots, politeness, warehouse, **kwargs):
        """Rebuild an engine from the last committed snapshot — the
        kill/restart contract (strictly stronger than the reference's
        _load_tasks rebuild, scheduler.py:264-281)."""
        eng = cls(spark, pages, robots, politeness, warehouse, **kwargs)
        last = eng.store.last_epoch()
        if last is None:
            return eng
        eng.epoch = last
        manifest = eng.store.manifest(last)
        eng.frontier = eng.store.read("frontier", last)
        eng.token_state = eng.store.read("token_state", last)
        if "seen_shards" in manifest["tables"]:
            eng.seen_shards = eng.store.read("seen_shards", last)
        if manifest["tables"].get("pending", {}).get("rows", 0) > 0:
            eng.pending = eng.store.read("pending", last)
            eng._pending_rows = manifest["tables"]["pending"]["rows"]
        else:
            eng._pending_rows = 0
        return eng

    # -- reporting ----------------------------------------------------------
    def results_df(self) -> DataFrame | None:
        try:
            return self.store.read_all_epochs("results")
        except FileNotFoundError:
            return None

    def metrics_json(self) -> str:
        return json.dumps(self.metrics)
