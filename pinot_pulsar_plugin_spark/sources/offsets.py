"""Offset codec: pack (ledgerId, entryId) into one monotonic long.

Replicates the reference's MessageIdUtils exactly
(`/root/reference/src/main/java/com/reelevant/pinot/plugins/stream/pulsar/MessageIdUtils.java`):

- encode: ``offset = (ledgerId << 28) | entryId``      (:33)
- decode: ``ledgerId = offset >> 28; entryId = offset & 0x0FFFFFFF`` (:39-40)

The entry field is 28 bits because Pulsar rolls ledgers over long
before entry ids approach 2^28 (comment :31-32). Caveat preserved from
the reference: encode does NOT mask entryId, so an entryId ≥ 2^28
silently corrupts the ledger bits (encode(l, e) == encode(l + (e >> 28),
e & MASK)); decode always masks. ``assert_valid_entry`` is provided for
callers that want to fail fast instead.

Sentinels: the reference maps Pinot's OffsetCriteria smallest/largest to
``MessageId.earliest``/``latest`` (PulsarStreamMetadataProvider.java:66-78)
and treats ``startOffset == -1`` as "earliest"
(PulsarPartitionLevelConsumer.java:112-115, comment :101). We keep -1 /
2^63-1 as the earliest/latest sentinels.

Offsets are per-partition; the partition number travels beside the
offset (reference: MessageIdImpl carries it; our rows carry a
``partition`` column), so the codec itself is partition-agnostic.
"""

from __future__ import annotations

ENTRY_BITS = 28
ENTRY_MASK = (1 << ENTRY_BITS) - 1  # 0x0FFFFFFF

EARLIEST_OFFSET = -1
LATEST_OFFSET = (1 << 63) - 1

_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def _wrap_i64(v: int) -> int:
    """Two's-complement 64-bit wrap (Java long semantics)."""
    return ((v - _I64_MIN) & ((1 << 64) - 1)) + _I64_MIN


def encode_offset(ledger_id: int, entry_id: int) -> int:
    """``(ledgerId << 28) | entryId`` with Java long overflow semantics.

    Faithful to MessageIdUtils.java:33 including the unmasked-entry
    caveat (entry_id >= 2^28 bleeds into ledger bits).
    """
    return _wrap_i64((_wrap_i64(ledger_id << ENTRY_BITS)) | entry_id)


def decode_offset(offset: int) -> tuple[int, int]:
    """Inverse of :func:`encode_offset` → ``(ledger_id, entry_id)``.

    MessageIdUtils.java:39-40: UNSIGNED shift (Java ``>>>``) for the
    ledger, mask for the entry. Masking to 64 bits before shifting
    reproduces ``>>>`` for negative packed offsets (ledger bits
    overflowing into the sign bit decode to the same large positive
    ledger id Java produces, not a negative one).
    """
    return (offset & ((1 << 64) - 1)) >> ENTRY_BITS, offset & ENTRY_MASK


def assert_valid_entry(entry_id: int) -> int:
    """Fail-fast guard for the codec's 28-bit entry domain."""
    if not 0 <= entry_id <= ENTRY_MASK:
        raise ValueError(
            f"entry_id {entry_id} outside [0, 2^{ENTRY_BITS}); the packed "
            "offset would corrupt ledger bits (reference caveat, "
            "MessageIdUtils.java:33)"
        )
    return entry_id


def next_offset(offset: int) -> int:
    """Successor position: ``offset + 1`` (MessageAndOffset.java:46-48).

    Note real offsets are non-dense across ledger rollovers, so the
    successor may not exist; consumers must seek gap-tolerantly ("first
    message with offset >= start", PulsarPartitionLevelConsumer.java:108-110).
    """
    return offset + 1
