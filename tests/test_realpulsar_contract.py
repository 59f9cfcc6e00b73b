"""RealPulsarBroker contract test against a scripted fake ``pulsar``
module (VERDICT r1 'What's missing' #2).

The real ``pulsar-client`` isn't installed here, so the client surface
RealPulsarBroker consumes — ``Client``, ``MessageId``, reader
``seek/read_next/has_message_available`` — is scripted in-process and
injected via ``sys.modules``. The spec for the scripted behavior is the
reference's client usage (PulsarPartitionLevelConsumer.java:112-131
seek-then-read, PulsarStreamMetadataProvider.java:51-58 partition
lookup): seek positions at the FIRST message with id >= requested
(gap-tolerant), reads are in id order.

The assertion is parity: RealPulsarBroker over the scripted client must
return byte-identical results to FakePulsarBroker over a directory
holding the same message set — same offsets, payloads, admission-cap
behavior, bounded ends, and compacted view.
"""

from __future__ import annotations

import importlib
import json
import sys
import types
from bisect import bisect_left

import pytest

from pinot_pulsar_plugin_spark.sources.fakebroker import FakePulsarBroker, TopicWriter
from pinot_pulsar_plugin_spark.sources.offsets import EARLIEST_OFFSET, encode_offset


# ---- scripted pulsar client ------------------------------------------------
# Message store shape: {"<topic>-partition-<N>": [(ledger, entry, key, bytes)]}


def _build_fake_pulsar(store: dict[str, list[tuple[int, int, str | None, bytes]]]):
    mod = types.ModuleType("pulsar")

    class _Mid:
        def __init__(self, ledger: int, entry: int):
            self._l, self._e = ledger, entry

        def ledger_id(self) -> int:
            return self._l

        def entry_id(self) -> int:
            return self._e

    class MessageId:
        """Constructor signature matches pulsar-client's
        MessageId(partition, ledgerId, entryId, batchIndex)."""

        earliest = object()
        latest = object()

        def __init__(self, partition: int, ledger: int, entry: int, batch: int):
            self.ledger, self.entry = ledger, entry

    class _Msg:
        def __init__(self, ledger: int, entry: int, payload: bytes):
            self._mid = _Mid(ledger, entry)
            self._payload = payload

        def message_id(self) -> _Mid:
            return self._mid

        def data(self) -> bytes:
            return self._payload

    class _Reader:
        def __init__(self, msgs: list[tuple[int, int, bytes, int | None]], start):
            self._msgs = sorted(msgs, key=lambda m: (m[0], m[1]))
            ids = [(l, e) for l, e, _, _ in self._msgs]
            if start is MessageId.earliest:
                self._pos = 0
            elif start is MessageId.latest:
                self._pos = len(self._msgs)
            else:
                # broker-side seek: first message with id >= requested
                # (consumer:108-110 — rollover gaps are legal targets)
                self._pos = bisect_left(ids, (start.ledger, start.entry))
            self.closed = False

        def has_message_available(self) -> bool:
            return self._pos < len(self._msgs)

        def read_next(self, timeout_millis: int = 0) -> _Msg:
            if self._pos >= len(self._msgs):
                raise TimeoutError("no message available")
            l, e, payload, _ = self._msgs[self._pos]
            self._pos += 1
            return _Msg(l, e, payload)

        def seek(self, ts_millis: int) -> None:
            # broker publish-time seek: first message with
            # publish_time (ms) >= target; unstamped messages predate
            for i, (_, _, _, pts) in enumerate(self._msgs):
                if pts is not None and pts // 1000 >= ts_millis:
                    self._pos = i
                    return
            self._pos = len(self._msgs)

        def close(self) -> None:
            self.closed = True

    class Client:
        def __init__(self, service_url: str):
            self.service_url = service_url
            self.readers: list[_Reader] = []
            self.closed = False

        def get_topic_partitions(self, topic: str) -> list[str]:
            parts = [name for name in store if name.startswith(f"{topic}-partition-")]
            if not parts:
                raise RuntimeError(f"unknown topic {topic}")  # → count 0
            return sorted(parts)

        def create_reader(self, topic_partition: str, start, is_read_compacted: bool = False):
            rows = store.get(topic_partition, [])
            if is_read_compacted:
                # compaction: latest message per key; unkeyed kept
                latest: dict[str, tuple[int, int]] = {}
                for l, e, key, _, _ in rows:
                    if key is not None and (l, e) > latest.get(key, (-1, -1)):
                        latest[key] = (l, e)
                rows = [
                    (l, e, key, p, pts)
                    for l, e, key, p, pts in rows
                    if key is None or latest[key] == (l, e)
                ]
            r = _Reader([(l, e, p, pts) for l, e, _, p, pts in rows], start)
            self.readers.append(r)
            return r

        def close(self) -> None:
            self.closed = True

    mod.MessageId = MessageId
    mod.Client = Client
    return mod


# ---- shared message set ----------------------------------------------------

_PTS0 = 1_700_000_000_000_000  # publish times: ms-aligned, 1 ms apart

_MSGS = []  # (partition, ledger, entry, key, payload, publish_ts_us)
for i in range(9):  # partition 0, ledger 0: entries 0-8
    _MSGS.append((0, 0, i, f"k{i % 3}", json.dumps({"i": i}).encode(), _PTS0 + i * 1000))
for i in range(9, 14):  # ledger rollover gap: ledger 3
    _MSGS.append((0, 3, i - 9, f"k{i % 3}", json.dumps({"i": i}).encode(), _PTS0 + i * 1000))
for i in range(4):  # partition 1
    _MSGS.append((1, 0, i, None, json.dumps({"i": 100 + i}).encode(), _PTS0 + i * 1000))


@pytest.fixture
def brokers(tmp_path, monkeypatch):
    """(RealPulsarBroker over scripted client, FakePulsarBroker over a
    directory) holding the identical message set."""
    # directory side
    w = TopicWriter(str(tmp_path), "t", partitions=2, rollover_every=9)
    cur_ledger = {0: 0, 1: 0}
    for part, ledger, entry, key, payload, pts in _MSGS:
        if ledger != cur_ledger[part]:
            w.set_ledger(part, ledger)
            cur_ledger[part] = ledger
        off = w.append(part, payload, key=key, publish_ts=pts)
        assert off == encode_offset(ledger, entry)
    fake_dir = FakePulsarBroker(str(tmp_path))

    # scripted-client side
    store: dict[str, list] = {}
    for part, ledger, entry, key, payload, pts in _MSGS:
        store.setdefault(f"t-partition-{part}", []).append((ledger, entry, key, payload, pts))
    monkeypatch.setitem(sys.modules, "pulsar", _build_fake_pulsar(store))
    import pinot_pulsar_plugin_spark.sources.realpulsar as rp

    rp = importlib.reload(rp)
    real = rp.RealPulsarBroker("pulsar://scripted:6650")
    yield real, fake_dir
    monkeypatch.delitem(sys.modules, "pulsar")
    importlib.reload(rp)  # restore import-gated state


def test_partition_count_parity(brokers):
    real, fake = brokers
    assert real.partition_count("t") == fake.partition_count("t") == 2
    assert real.partition_count("nope") == fake.partition_count("nope") == 0


def test_earliest_latest_parity(brokers):
    real, fake = brokers
    for p in (0, 1):
        assert real.earliest_offset("t", p) == fake.earliest_offset("t", p)
        assert real.latest_offset("t", p) == fake.latest_offset("t", p)


def test_fetch_full_scan_parity(brokers):
    real, fake = brokers
    for p in (0, 1):
        a = real.fetch("t", p, EARLIEST_OFFSET)
        b = fake.fetch("t", p, EARLIEST_OFFSET)
        assert [(m.offset, m.payload) for m in a] == [(m.offset, m.payload) for m in b]


def test_gap_tolerant_seek_parity(brokers):
    """Seek into the ledger-0→3 rollover gap: both brokers must resume
    at ledger 3 entry 0 (consumer:108-110 seek semantics)."""
    real, fake = brokers
    in_gap = encode_offset(0, 8) + 1
    a = real.fetch("t", 0, in_gap)
    b = fake.fetch("t", 0, in_gap)
    assert a[0].offset == b[0].offset == encode_offset(3, 0)
    assert [(m.offset, m.payload) for m in a] == [(m.offset, m.payload) for m in b]


def test_admission_and_bounds_parity(brokers):
    real, fake = brokers
    for kwargs in (
        {"max_msgs": 4},
        {"max_bytes": 25},
        {"end_offset": encode_offset(0, 6)},
        {"max_msgs": 3, "end_offset": encode_offset(3, 1)},
    ):
        a = real.fetch("t", 0, EARLIEST_OFFSET, **kwargs)
        b = fake.fetch("t", 0, EARLIEST_OFFSET, **kwargs)
        assert [(m.offset, m.payload) for m in a] == [(m.offset, m.payload) for m in b], kwargs


def test_compacted_parity(brokers):
    """is_read_compacted on the scripted client vs the fake broker's
    sidecar-driven compaction: identical latest-per-key view."""
    real, fake = brokers
    a = real.fetch("t", 0, EARLIEST_OFFSET, compacted=True)
    b = fake.fetch("t", 0, EARLIEST_OFFSET, compacted=True)
    assert [(m.offset, m.payload) for m in a] == [(m.offset, m.payload) for m in b]
    # unkeyed partition: compaction is a no-op
    a1 = real.fetch("t", 1, EARLIEST_OFFSET, compacted=True)
    b1 = fake.fetch("t", 1, EARLIEST_OFFSET, compacted=True)
    assert len(a1) == len(b1) == 4


def test_ack_is_advisory_noop(brokers):
    real, _ = brokers
    assert real.acknowledge_cumulative("t", 0, encode_offset(0, 3)) is True


def test_import_gate_without_client():
    """Without pulsar-client importable, construction raises the
    documented NotImplementedError (import gate intact)."""
    import pinot_pulsar_plugin_spark.sources.realpulsar as rp

    if rp.HAVE_PULSAR:  # pragma: no cover - depends on env
        pytest.skip("pulsar-client installed in this environment")
    with pytest.raises(NotImplementedError):
        rp.RealPulsarBroker("pulsar://nope:6650")


# ---- live-broker smoke (env-gated, skipped by default) ---------------------


@pytest.mark.skipif(
    "PULSAR_URL" not in __import__("os").environ,
    reason="set PULSAR_URL=pulsar://host:6650 to smoke-test a live broker",
)
def test_live_broker_smoke():
    """End-to-end against a REAL Pulsar broker (VERDICT r2 #6 / r3 #6):
    publish a handful of messages, then exercise every method the
    pulsarlike source consumes — partition_count, earliest/latest
    offset resolution, bounded fetch — through RealPulsarBroker.
    Runs only when PULSAR_URL is set (CI has no broker; see README)."""
    import os
    import uuid

    # the scripted-client tests above inject a fake `pulsar` module;
    # a live run needs the real client
    sys.modules.pop("pulsar", None)
    pulsar = pytest.importorskip("pulsar")
    import pinot_pulsar_plugin_spark.sources.realpulsar as rp

    rp = importlib.reload(rp)

    url = os.environ["PULSAR_URL"]
    base = f"smoke-{uuid.uuid4().hex[:12]}"
    payloads = [json.dumps({"i": i}).encode() for i in range(5)]
    client = pulsar.Client(url)
    try:
        # non-partitioned topic named like partition 0 of `base`, the
        # same layout the broker gives partitioned topics
        producer = client.create_producer(f"{base}-partition-0")
        for p in payloads:
            producer.send(p)
        producer.close()
    finally:
        client.close()

    b = rp.RealPulsarBroker(url)
    try:
        lo = b.earliest_offset(base, 0)
        hi = b.latest_offset(base, 0)
        assert hi > lo >= 0
        msgs = b.fetch(base, 0, EARLIEST_OFFSET)
        assert [m.payload for m in msgs] == payloads
        assert [m.offset for m in msgs] == sorted(m.offset for m in msgs)
        assert len(b.fetch(base, 0, EARLIEST_OFFSET, max_msgs=2)) == 2
        # restart-cursor shape: resume from the 3rd message's offset
        tail = b.fetch(base, 0, msgs[2].offset)
        assert [m.payload for m in tail] == payloads[2:]
        assert b.acknowledge_cumulative(base, 0, msgs[-1].offset) is True
    finally:
        b.close()


def test_timestamp_seek_parity(brokers):
    """first_offset_at_or_after parity on ms-aligned targets: before
    all messages → earliest, mid-stream boundaries (incl. across the
    ledger-rollover gap) → the same offset on both brokers, past the
    live edge → latest_offset. (Non-ms-aligned targets are documented
    to land ≤999 µs early on the real client — Pulsar's seek is
    millisecond-grain — so parity is asserted on aligned targets.)"""
    real, fake = brokers
    for part in (0, 1):
        targets = [
            _PTS0 - 1_000_000,          # before everything
            _PTS0,                      # exactly the first message
            _PTS0 + 5 * 1000,           # mid ledger
            _PTS0 + 10 * 1000,          # after the rollover gap (part 0)
            _PTS0 + 10**9,              # far future
        ]
        for ts in targets:
            a = real.first_offset_at_or_after("t", part, ts)
            b = fake.first_offset_at_or_after("t", part, ts)
            assert a == b, (part, ts, a, b)
    assert real.first_offset_at_or_after("t", 0, _PTS0 + 10**9) == real.latest_offset("t", 0)


def test_seek_never_skips_on_sidecar_corruption(brokers, tmp_path):
    """ADVICE r6 #3 / VERDICT r7 #4: the two brokers must fail in the
    SAME at-least-once direction. The real client's publish-time seek
    can only land early (ms-grain floor; the broker always stamps), so
    the fake must never land LATE either — a truncated/missing .pts
    sidecar used to read as "unstamped = predates everything", making
    the seek position PAST the corrupt ledger and skip its data. Pin:
    with ledger 3's sidecar truncated, every seek target lands at or
    BEFORE the offset the intact real broker resolves (re-delivery,
    never loss), and specifically at the corrupt ledger's first offset
    once the target falls inside or after it."""
    real, fake = brokers
    pts_path = tmp_path / "t" / "partition-0" / "ledger-00000003.pts"
    lines = pts_path.read_bytes().splitlines(keepends=True)
    pts_path.write_bytes(b"".join(lines[:-2]))  # truncate: misaligned

    ledger3_first = encode_offset(3, 0)
    for ts in (
        _PTS0 - 1_000_000,   # before everything
        _PTS0 + 5 * 1000,    # mid ledger 0 (intact)
        _PTS0 + 10 * 1000,   # inside the corrupt ledger
        _PTS0 + 10**9,       # far future — corrupt data still qualifies
    ):
        intact = real.first_offset_at_or_after("t", 0, ts)
        got = fake.first_offset_at_or_after("t", 0, ts)
        assert got <= intact, (ts, got, intact)
        if ts >= _PTS0 + 9 * 1000:
            assert got == ledger3_first
    # A fully MISSING sidecar is the same corruption class.
    pts_path.unlink()
    assert fake.first_offset_at_or_after("t", 0, _PTS0 + 10**9) == ledger3_first
    # Partition 1 (aligned sidecar, real null stamps elsewhere) keeps
    # exact parity with the real client.
    assert fake.first_offset_at_or_after("t", 1, _PTS0 + 2 * 1000) == \
        real.first_offset_at_or_after("t", 1, _PTS0 + 2 * 1000)
