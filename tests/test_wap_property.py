"""Property-fuzz of the Iceberg write-audit-publish commit protocol
against the modeled fake (VERDICT r4 next-7): randomized interleavings
of {writer A/B commits, validation failures, crash-before-publish with
a stale audit branch left behind, concurrent external commits racing
the publish, redeliveries, branch GC, snapshot expiration, reopen}
asserting the two delivery invariants over >= 120 seeded schedules:

- **nothing doubled**: every successfully published commit key appears
  in main's lineage EXACTLY once, and a redelivery of a retained key is
  a no-op (False) that adds no snapshot;
- **nothing lost**: an invalid / crashed / publish-conflicted attempt
  leaves main byte-identical (its key absent) until a later retry
  publishes it exactly once.

The test mirrors main's expected summary lineage op-by-op and compares
it to the fake's ground truth after every schedule — the same style
tests/test_interleaving_property.py applies to the runner. Expiration
is modeled WITH its documented caveat: a key expired out of the
retained lineage is no longer visible to committed_keys, so a
redelivery of an EXPIRED key re-applies (asserted explicitly — this is
the retention contract, min_age must exceed the redelivery window)."""

import random

import pytest

from debezium_partial_snapshotter_spark.plans import iceberg as ice
from debezium_partial_snapshotter_spark.plans.lake import CommitConflict
from tests.test_iceberg_unit import FakeDF, FakeSpark


@pytest.fixture()
def fake_factory(monkeypatch, spark):
    monkeypatch.setattr(ice, "is_available", lambda s: True)
    return FakeSpark


def _keys_on_main(fake):
    return [s["summary"].get(ice.COMMIT_KEY_PROP) for s in fake.main]


def _commit(t, fake, key, validate=None):
    log = {"options": {}}
    return t.replace_buckets(
        FakeDF(fake, log), [0], commit_key=key,
        validate=(lambda: True) if validate is None else validate,
    )


def _run_schedule(seed: int, fake_factory) -> None:
    rng = random.Random(seed)
    empty_insert = rng.random() < 0.5
    fake = fake_factory(empty_insert_creates_snapshot=empty_insert)
    t = ice.IcebergTable(fake, "cat.db.t")

    lineage: list[str | None] = []  # expected main summaries, in order
    published: list[str] = []  # retained published keys (expire trims)
    expired_keys: list[str] = []
    crashed_pending: list[str] = []
    counter = 0

    def fresh_key(writer: str) -> str:
        nonlocal counter
        counter += 1
        return f"{writer}:tail:{counter}"

    def bootstrap_sentinels_if_first():
        # the first validated write on an empty table forks a branch,
        # which needs a snapshot: _ensure_snapshot adds 1 zero-record
        # snapshot (runtimes that commit empty inserts) or 2 sentinel
        # data snapshots (append + delete) first
        if not fake.main:
            lineage.extend([None] if empty_insert else [None, None])

    def do_commit(writer: str):
        key = fresh_key(writer)
        bootstrap_sentinels_if_first()
        assert _commit(t, fake, key) is True
        lineage.append(key)
        published.append(key)

    def do_invalid_then_retry(writer: str):
        key = fresh_key(writer)
        bootstrap_sentinels_if_first()
        assert _commit(t, fake, key, validate=lambda: False) == "invalid"
        # main untouched beyond the modeled bootstrap sentinels
        assert _keys_on_main(fake) == lineage
        assert key not in t.committed_keys()
        assert _commit(t, fake, key) is True  # retry publishes once
        lineage.append(key)
        published.append(key)

    def do_publish_conflict(writer: str):
        key = fresh_key(writer)
        bootstrap_sentinels_if_first()

        raced = {"done": False}

        def validate_with_race():
            if not raced["done"]:
                raced["done"] = True
                fake.external_commit({})  # lands on main mid-audit
            return True

        with pytest.raises(CommitConflict):
            _commit(t, fake, key, validate=validate_with_race)
        lineage.append(None)  # the external commit IS retained
        assert _keys_on_main(fake) == lineage  # key NOT clobbered in
        assert key not in t.committed_keys()
        assert _commit(t, fake, key) is True  # re-merge + retry
        lineage.append(key)
        published.append(key)

    def do_crash_before_publish(writer: str):
        # a writer that died after staging (steps 1-2): branch + branch
        # commit exist, main untouched, finally-cleanup never ran
        if not fake.main:
            return  # need a snapshot to fork from; skip degenerate case
        key = fresh_key(writer)
        branch = t._audit_branch_name(key)
        fake.sql(
            f"ALTER TABLE cat.db.t CREATE OR REPLACE BRANCH {branch}"
        )
        fake.commit(
            f"cat.db.t.branch_{branch}", {ice.COMMIT_KEY_PROP: key}
        )
        assert _keys_on_main(fake) == lineage  # staged only: main clean
        assert key not in t.committed_keys()
        crashed_pending.append(key)

    def do_recover_crashed():
        if not crashed_pending:
            return
        key = crashed_pending.pop(rng.randrange(len(crashed_pending)))
        # redelivery of the crashed epoch: CREATE OR REPLACE resets the
        # stale branch (if gc has not dropped it) and publishes ONCE
        assert _commit(t, fake, key) is True
        lineage.append(key)
        published.append(key)

    def do_redeliver():
        if not published:
            return
        key = rng.choice(published)
        before = _keys_on_main(fake)
        assert _commit(t, fake, key) is False  # exactly-once holds
        assert _keys_on_main(fake) == before

    def do_redeliver_expired():
        # the DOCUMENTED retention caveat: an expired key re-applies
        if not expired_keys:
            return
        key = expired_keys.pop()
        bootstrap_sentinels_if_first()
        assert _commit(t, fake, key) is True
        lineage.append(key)
        published.append(key)

    def do_gc():
        dropped = t.gc_stale_audit_branches()
        # only audit branches are ever dropped, never foreign refs
        assert all(b.startswith("dps_audit_") for b in dropped)

    def do_reopen():
        nonlocal t
        t = ice.IcebergTable(fake, "cat.db.t")

    def do_expire():
        nonlocal lineage
        if not fake.main:
            return
        do_gc()  # quiesce: stale audit branches would pin fork points
        # age every snapshot so older_than (= now at min_age 0) covers
        # them all — the fake faithfully refuses to expire snapshots
        # committed in the same millisecond as the call, which the
        # lineage model below (a clean keep_last trim) does not track
        for s in fake.all_snaps:
            s["ts_ms"] = 0
        keep = rng.randint(1, max(1, len(fake.main)))
        t.expire_versions(keep_last=keep, min_age_sec=0)
        dropped, lineage = lineage[:-keep], lineage[-keep:]
        for k in dropped:
            if k is not None and k in published:
                published.remove(k)
                expired_keys.append(k)

    ops = [
        (do_commit, 6), (do_invalid_then_retry, 2),
        (do_publish_conflict, 2), (do_crash_before_publish, 2),
        (do_recover_crashed, 2), (do_redeliver, 3),
        (do_redeliver_expired, 1), (do_gc, 1), (do_expire, 1),
        (do_reopen, 1),
    ]
    weighted = [f for f, w in ops for _ in range(w)]
    for _ in range(rng.randint(6, 14)):
        op = rng.choice(weighted)
        if op in (do_commit, do_invalid_then_retry, do_publish_conflict,
                  do_crash_before_publish):
            op(rng.choice("AB"))
        else:
            op()

    # ---- end-of-schedule invariants ----------------------------------
    got = _keys_on_main(fake)
    assert got == lineage, f"seed {seed}: lineage diverged"
    # nothing doubled: every published key appears exactly once
    for k in published:
        assert got.count(k) == 1, f"seed {seed}: key {k} duplicated"
    # nothing lost: every retained published key is visible for dedup
    assert set(published) <= t.committed_keys() or not published
    # no half-state: keys staged by crashes that were never recovered
    # are NOT visible on main
    for k in crashed_pending:
        assert k not in got and k not in t.committed_keys()


def test_wap_protocol_randomized_schedules(fake_factory):
    for seed in range(120):
        _run_schedule(seed, fake_factory)
