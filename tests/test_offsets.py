"""Offset codec properties (MessageIdUtils parity, SURVEY.md §5.3)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pinot_pulsar_plugin_spark.sources.offsets import (
    EARLIEST_OFFSET,
    ENTRY_MASK,
    assert_valid_entry,
    decode_offset,
    encode_offset,
    next_offset,
)

import pytest


@given(
    ledger=st.integers(min_value=0, max_value=(1 << 35) - 1),
    entry=st.integers(min_value=0, max_value=ENTRY_MASK),
)
@settings(max_examples=500)
def test_roundtrip_in_domain(ledger, entry):
    """decode(encode(l,e)) == (l,e) for entry in [0, 2^28) — the
    bijection the reference relies on (MessageIdUtils.java:25-43)."""
    assert decode_offset(encode_offset(ledger, entry)) == (ledger, entry)


@given(
    l1=st.integers(min_value=0, max_value=(1 << 34) - 1),
    e1=st.integers(min_value=0, max_value=ENTRY_MASK),
    l2=st.integers(min_value=0, max_value=(1 << 34) - 1),
    e2=st.integers(min_value=0, max_value=ENTRY_MASK),
)
def test_order_preserving(l1, e1, l2, e2):
    """Encoded offsets order like (ledger, entry) tuples — the property
    that makes the long usable as a monotonic cursor."""
    assert ((l1, e1) < (l2, e2)) == (encode_offset(l1, e1) < encode_offset(l2, e2))


def test_reference_overflow_caveat():
    """The reference does NOT mask entryId on encode (MessageIdUtils.java:33):
    entryId ≥ 2^28 silently bleeds into the ledger bits. Replicated
    faithfully; documented here as the collision it causes."""
    corrupted = encode_offset(5, ENTRY_MASK + 7)  # entry = 2^28 + 6
    # the overflow bit ORs into ledger bit 0 (already set for ledger 5),
    # so the message aliases a different, legitimate id entirely:
    assert decode_offset(corrupted) == (5, 6)
    assert corrupted == encode_offset(5, 6)  # collision with a legit id
    # with an even ledger the OR flips the ledger id itself:
    assert decode_offset(encode_offset(4, ENTRY_MASK + 7)) == (5, 6)
    with pytest.raises(ValueError):
        assert_valid_entry(ENTRY_MASK + 1)


def test_sentinels_and_successor():
    assert EARLIEST_OFFSET == -1  # consumer:112-115 "start == -1 → earliest"
    assert next_offset(encode_offset(3, 9)) == encode_offset(3, 10)
    # successor at a ledger edge points into a gap (non-dense space):
    # consumers must seek to "first message with offset >= start".
    edge = encode_offset(3, ENTRY_MASK)
    assert decode_offset(next_offset(edge)) == (4, 0)


def test_java_long_wrap():
    """Encode uses Java long two's-complement semantics, not Python
    bigints (MessageId.latest-style huge ledger ids must not produce
    Python-only >64-bit values)."""
    v = encode_offset((1 << 62) - 1, 123)
    assert -(1 << 63) <= v < (1 << 63)


def test_decode_negative_offset_unsigned_shift():
    """MessageIdUtils.java:39 uses '>>>' (unsigned shift): a packed
    offset whose ledger bits reach the sign bit must decode to the same
    large positive ledger id Java produces, never a negative one."""
    assert decode_offset(-1) == ((1 << 36) - 1, ENTRY_MASK)
    neg = encode_offset((1 << 35) + 5, 9)  # ledger bit 35 → sign bit
    assert neg < 0  # java-long wrapped
    ledger, entry = decode_offset(neg)
    assert (ledger, entry) == ((1 << 35) + 5, 9)
    assert ledger >= 0
