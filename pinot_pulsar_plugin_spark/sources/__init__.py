"""Pulsar-shaped streaming source stack.

offsets.py     (ledgerId, entryId) <-> long codec  [MessageIdUtils parity]
fakebroker.py  directory-backed broker with Pulsar fetch semantics
pulsarlike.py  Spark 4 Python DataSource (batch + micro-batch stream)
decode.py      JSON decode-or-drop projection      [decoder parity]
"""

from pinot_pulsar_plugin_spark.sources.offsets import (  # noqa: F401
    EARLIEST_OFFSET,
    LATEST_OFFSET,
    decode_offset,
    encode_offset,
)
