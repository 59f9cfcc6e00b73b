"""Directory-backed fake Pulsar broker.

Stands in for a Pulsar cluster so the streaming source is testable with
no network (SURVEY.md §7 phase 3b: "file/directory-fed fake broker ...
so CI needs no broker"). The real ``pulsar-client`` could back the same
source by swapping this class behind the identical fetch interface.

Topic layout on disk::

    <root>/<topic>/partition-<N>/ledger-<LLLLLLLL>.jsonl

One JSONL line per message payload (UTF-8). Entry ids are dense line
numbers within a ledger; ledger rollover creates the offset gaps real
Pulsar has, which is exactly what the gap-tolerant seek must handle.

Semantics replicated from the reference consumer
(`SRC/PulsarPartitionLevelConsumer.java`):

- fetch returns the first message with ``offset >= start`` (broker-side
  seek semantics, comment :108-110) — start offsets pointing into a
  rollover gap are legal;
- ``start == -1`` means earliest (:112-115);
- batch admission: at most ``max_msgs`` messages and ``max_bytes``
  cumulative payload bytes per fetch (BatchReceivePolicy :69-73,
  defaults 500 / 10 MiB, PulsarPartitionLevelStreamConfig.java:36-40);
- cumulative ack is advisory only — progress truth lives with the
  engine (NonDurable subscription :66, "anyway it's pinot that choose
  the cursor" :157); here acks land in a sidecar file, best-effort.
"""

from __future__ import annotations

import json
import os
import re
from bisect import bisect_left
from dataclasses import dataclass

from pinot_pulsar_plugin_spark.sources.offsets import (
    EARLIEST_OFFSET,
    decode_offset,
    encode_offset,
)

DEFAULT_MAX_MSGS = 500  # consumer.maxMsgs default, StreamConfig:38
DEFAULT_MAX_BYTES = 10 * 1024 * 1024  # consumer.maxBytes default, StreamConfig:36

_LEDGER_RE = re.compile(r"ledger-(\d+)\.jsonl$")
_PART_RE = re.compile(r"partition-(\d+)$")


@dataclass(frozen=True)
class FetchedMessage:
    offset: int
    payload: bytes

    @property
    def next_offset(self) -> int:  # MessageAndOffset.java:46-48
        return self.offset + 1


class FakePulsarBroker:
    def __init__(self, root: str):
        self.root = root

    # ---- topology (metadata provider parity) ----

    def _topic_dir(self, topic: str) -> str:
        return os.path.join(self.root, topic)

    def partition_count(self, topic: str) -> int:
        """# partitions (PulsarStreamMetadataProvider.java:51-58 —
        returns 0 on failure rather than raising)."""
        try:
            return len(
                [d for d in os.listdir(self._topic_dir(topic)) if _PART_RE.search(d)]
            )
        except OSError:
            return 0

    def _partition_dir(self, topic: str, partition: int) -> str:
        # consumed by name "<topic>-partition-<N>" in the reference
        # (PulsarPartitionLevelConsumer.java:58)
        return os.path.join(self._topic_dir(topic), f"partition-{partition}")

    def _ledgers(self, topic: str, partition: int) -> list[int]:
        pdir = self._partition_dir(topic, partition)
        out = []
        try:
            for f in os.listdir(pdir):
                m = _LEDGER_RE.search(f)
                if m:
                    out.append(int(m.group(1)))
        except OSError:
            return []
        return sorted(out)

    def _offsets_index(self, topic: str, partition: int) -> list[tuple[int, str, int]]:
        """Sorted (offset, ledger_path, line_no) triples for a partition."""
        idx: list[tuple[int, str, int]] = []
        for ledger in self._ledgers(topic, partition):
            path = os.path.join(
                self._partition_dir(topic, partition), f"ledger-{ledger:08d}.jsonl"
            )
            with open(path, "rb") as fh:
                for entry, _ in enumerate(fh):
                    idx.append((encode_offset(ledger, entry), path, entry))
        idx.sort(key=lambda x: x[0])
        return idx

    def earliest_offset(self, topic: str, partition: int) -> int:
        """Offset of the first message (≡ MessageId.earliest resolution,
        PulsarStreamMetadataProvider.java:72-74)."""
        idx = self._offsets_index(topic, partition)
        return idx[0][0] if idx else 0

    def latest_offset(self, topic: str, partition: int) -> int:
        """One past the last message — the next position a new message
        would take (≡ MessageId.latest, provider:70-71)."""
        idx = self._offsets_index(topic, partition)
        return idx[-1][0] + 1 if idx else 0

    # ---- data plane (partition consumer parity) ----

    def _keys_index(self, topic: str, partition: int) -> dict[int, str | None]:
        """offset → message key (None when unkeyed / no sidecar). Keys
        live in ``ledger-<L>.keys`` sidecars, one JSON-encoded key per
        line, aligned with the ledger's entries."""
        keys: dict[int, str | None] = {}
        # per-ledger entry counts come from the offsets index (already
        # one line-scan per ledger) instead of re-reading every .jsonl
        # here — _keys_index runs on each compacted fetch, so counting
        # again doubled the ledger I/O (ADVICE r3)
        entry_counts: dict[str, int] = {}
        for _, path, _ in self._offsets_index(topic, partition):
            entry_counts[path] = entry_counts.get(path, 0) + 1
        for ledger in self._ledgers(topic, partition):
            pdir = self._partition_dir(topic, partition)
            kpath = os.path.join(pdir, f"ledger-{ledger:08d}.keys")
            try:
                with open(kpath, "rb") as fh:
                    lines = fh.read().split(b"\n")
                    if lines and lines[-1] == b"":
                        lines.pop()
            except OSError:
                continue
            # A truncated / partially written sidecar would silently
            # shift the key→offset alignment and compaction would hide
            # the WRONG messages; require exact line alignment with the
            # ledger and treat the ledger as unkeyed otherwise
            # (ADVICE r2).
            lpath = os.path.join(pdir, f"ledger-{ledger:08d}.jsonl")
            if len(lines) != entry_counts.get(lpath, 0):
                continue
            for entry, raw in enumerate(lines):
                keys[encode_offset(ledger, entry)] = json.loads(raw)
        return keys

    def _pts_index(
        self, topic: str, partition: int
    ) -> tuple[dict[int, int | None], set[int]]:
        """(offset → publish timestamp µs, untrusted offsets).

        Publish times live in ``ledger-<L>.pts`` sidecars, one JSON int
        (or ``null`` = the writer deliberately did not stamp) per line,
        aligned with the ledger's entries. A MISSING or MISALIGNED
        sidecar is different from a null stamp: TopicWriter always
        writes a .pts line per entry, so misalignment means the sidecar
        was truncated or tampered with and NOTHING in that ledger has a
        trustworthy publish time. Those offsets go in the ``untrusted``
        set instead of being silently treated as unstamped — the old
        treat-as-unstamped behavior made a timestamp seek position PAST
        corrupt ledgers and skip their data, the opposite failure
        direction from the real broker, which always stamps broker-side
        and whose ms-grain seek only ever lands early (ADVICE r6 #3 /
        VERDICT r7 #4)."""
        pts: dict[int, int | None] = {}
        untrusted: set[int] = set()
        entry_counts: dict[str, int] = {}
        ledger_offsets: dict[int, list[int]] = {}
        for off, path, _ in self._offsets_index(topic, partition):
            entry_counts[path] = entry_counts.get(path, 0) + 1
            ledger_offsets.setdefault(decode_offset(off)[0], []).append(off)
        for ledger in self._ledgers(topic, partition):
            pdir = self._partition_dir(topic, partition)
            tpath = os.path.join(pdir, f"ledger-{ledger:08d}.pts")
            lpath = os.path.join(pdir, f"ledger-{ledger:08d}.jsonl")
            try:
                with open(tpath, "rb") as fh:
                    lines = fh.read().split(b"\n")
                    if lines and lines[-1] == b"":
                        lines.pop()
            except OSError:
                untrusted.update(ledger_offsets.get(ledger, ()))
                continue
            if len(lines) != entry_counts.get(lpath, 0):
                untrusted.update(ledger_offsets.get(ledger, ()))
                continue
            for entry, raw in enumerate(lines):
                pts[encode_offset(ledger, entry)] = json.loads(raw)
        return pts, untrusted

    def first_offset_at_or_after(self, topic: str, partition: int, ts_us: int) -> int:
        """Publish-time seek: the offset of the first message with
        publish_ts >= ``ts_us`` — ``Consumer.seek(long timestamp)`` /
        Kafka ``startingTimestamp`` semantics. Deliberately unstamped
        messages (explicit ``null`` in an aligned sidecar) are treated
        as published at -inf: they predate every seek target, so a
        timestamp seek starts after them. Offsets whose sidecar is
        missing or misaligned are UNTRUSTED and qualify unconditionally
        — the seek lands at or before them (at-least-once, the same
        never-skip direction as the real client's millisecond-floored
        seek), never past them. If nothing qualifies, returns
        ``latest_offset`` (the position the next published message
        would take — seek-to-future lands at the live edge). Publish
        times are monotonic per partition (the Pulsar broker stamps
        them in append order), so the first qualifying offset in index
        order is THE boundary."""
        pts, untrusted = self._pts_index(topic, partition)
        for off, _, _ in self._offsets_index(topic, partition):
            if off in untrusted:
                return off
            t = pts.get(off)
            if t is not None and t >= ts_us:
                return off
        return self.latest_offset(topic, partition)

    def _superseded(self, topic: str, partition: int) -> set[int]:
        """Offsets hidden by compaction: keyed messages with a later
        message (higher offset) carrying the same key. Unkeyed messages
        are never compacted away."""
        latest: dict[str, int] = {}
        keys = self._keys_index(topic, partition)
        for off, key in keys.items():
            if key is not None and off > latest.get(key, -(1 << 62)):
                latest[key] = off
        return {
            off
            for off, key in keys.items()
            if key is not None and latest[key] != off
        }

    def fetch(
        self,
        topic: str,
        partition: int,
        start_offset: int,
        *,
        end_offset: int | None = None,
        max_msgs: int = DEFAULT_MAX_MSGS,
        max_bytes: int = DEFAULT_MAX_BYTES,
        compacted: bool = False,
    ) -> list[FetchedMessage]:
        """Bounded batch fetch from ``start_offset`` (gap-tolerant).

        Mirrors fetchMessages (consumer:88-166) with one deliberate
        improvement: a bounded ``end_offset`` (exclusive) is honored —
        the reference rejects bounded reads (:94-98) because Pulsar's
        reader API predates them; Spark micro-batches are bounded by
        construction, and the offset codec makes ranges well-defined.

        ``compacted=True`` serves the compacted view — the latest
        message per key, unkeyed messages untouched — matching the
        reference's source-level ``readCompacted(true)`` subscription
        (PulsarPartitionLevelConsumer.java:68). Offsets are unchanged;
        superseded messages are simply not delivered.
        """
        if start_offset == EARLIEST_OFFSET:
            start_offset = self.earliest_offset(topic, partition)
        idx = self._offsets_index(topic, partition)
        offsets = [o for o, _, _ in idx]
        pos = bisect_left(offsets, start_offset)  # first msg offset >= start
        hidden = self._superseded(topic, partition) if compacted else set()
        out: list[FetchedMessage] = []
        nbytes = 0
        by_file: dict[str, list[str]] = {}
        while pos < len(idx) and len(out) < max_msgs:
            offset, path, line_no = idx[pos]
            if end_offset is not None and offset >= end_offset:
                break
            if offset in hidden:
                pos += 1
                continue
            if path not in by_file:
                # split on b"\n" only — the same delimiter
                # _offsets_index counts entries by (iterating a binary
                # file yields \n-terminated lines); splitlines() would
                # also split on \r, \v, \f, \x1c-\x1e and misalign line
                # numbers for payloads containing those bytes
                with open(path, "rb") as fh:
                    lines = fh.read().split(b"\n")
                    if lines and lines[-1] == b"":
                        lines.pop()  # trailing newline
                    by_file[path] = lines
            payload = by_file[path][line_no]
            if out and nbytes + len(payload) > max_bytes:
                break
            out.append(FetchedMessage(offset, bytes(payload)))
            nbytes += len(payload)
            pos += 1
        return out

    def acknowledge_cumulative(self, topic: str, partition: int, offset: int) -> bool:
        """Best-effort cumulative ack (consumer:154-162 — failures are
        logged and tolerated; the engine's checkpoint owns progress).

        Monotonic: a cumulative ack can only move forward, like Pulsar's
        broker-side cursor — a late/replayed ack for an older offset
        never regresses the recorded position.
        """
        try:
            prev = self.acked_through(topic, partition)
            if prev is not None and prev > offset:
                return True
            path = os.path.join(self._partition_dir(topic, partition), "_acks.json")
            with open(path, "w") as fh:
                json.dump({"acked_through": offset}, fh)
            return True
        except OSError:
            return False

    def acked_through(self, topic: str, partition: int) -> int | None:
        """Last cumulatively-acked offset, or None if never acked /
        unreadable. Advisory only (NonDurable subscription): the engine
        uses it to recover its admission cursor after a restart, never
        as the source of truth for what was read."""
        try:
            path = os.path.join(self._partition_dir(topic, partition), "_acks.json")
            with open(path) as fh:
                return int(json.load(fh)["acked_through"])
        except (OSError, ValueError, KeyError, TypeError):
            return None


class TopicWriter:
    """Test/fixture helper: append messages to a topic, with explicit
    ledger rollover so fixtures contain real offset gaps."""

    def __init__(self, root: str, topic: str, partitions: int, rollover_every: int = 1000):
        self.root = root
        self.topic = topic
        self.partitions = partitions
        self.rollover_every = rollover_every
        self._state: dict[int, tuple[int, int]] = {}  # partition -> (ledger, entry)
        for p in range(partitions):
            os.makedirs(os.path.join(root, topic, f"partition-{p}"), exist_ok=True)
            self._state[p] = (0, 0)

    def set_ledger(self, partition: int, ledger: int) -> None:
        """Force a rollover to a specific ledger id (creates a gap)."""
        self._state[partition] = (ledger, 0)

    def append(
        self,
        partition: int,
        payload: bytes | str,
        key: str | None = None,
        publish_ts: int | None = None,
    ) -> int:
        """Write one message; returns its encoded offset. ``key`` is the
        Pulsar message key (drives compaction); a ``.keys`` sidecar line
        is written per entry so the broker can serve compacted reads.
        ``publish_ts`` (µs) is the broker publish time backing
        timestamp seeks (``.pts`` sidecar); None = unstamped (treated
        as predating every seek target)."""
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        # \n is the ledger delimiter; the other bytes are rejected too so
        # fixtures stay safe even for tools that use splitlines()
        if any(ch in payload for ch in (b"\n", b"\r", b"\x0b", b"\x0c", b"\x1c", b"\x1d", b"\x1e")):
            raise ValueError(
                "jsonl fake broker: payload may not contain line-boundary bytes"
            )
        ledger, entry = self._state[partition]
        if entry >= self.rollover_every:
            ledger, entry = ledger + 1, 0
        path = os.path.join(
            self.root, self.topic, f"partition-{partition}", f"ledger-{ledger:08d}.jsonl"
        )
        with open(path, "ab") as fh:
            fh.write(payload + b"\n")
        with open(path[: -len(".jsonl")] + ".keys", "ab") as fh:
            fh.write(json.dumps(key).encode("utf-8") + b"\n")
        with open(path[: -len(".jsonl")] + ".pts", "ab") as fh:
            fh.write(json.dumps(publish_ts).encode("utf-8") + b"\n")
        self._state[partition] = (ledger, entry + 1)
        return encode_offset(ledger, entry)
