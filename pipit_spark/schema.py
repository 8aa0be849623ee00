"""Canonical events schema for pipit-spark.

Mirrors the canonical pandas schema every reference reader assembles
(reference: pipit/readers/otf2_reader.py:331-340, pipit/trace.py:70-97)
but re-expressed for Spark:

* pandas df-index-as-identity (reference pipit/trace.py:180-184,267)
  becomes an explicit ``event_id`` long column;
* per-location file order (tie-break, reference
  pipit/readers/hpctoolkit_reader.py:1353-1363) becomes an explicit
  ``seq`` long column;
* column names are snake_case without spaces/dots so they are plain SQL
  identifiers (``Timestamp (ns)`` -> ``timestamp_ns``; derived
  ``time.inc`` -> ``time_inc``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- canonical column names -------------------------------------------------
EVENT_ID = "event_id"
TIMESTAMP = "timestamp_ns"
SEQ = "seq"
EVENT_TYPE = "event_type"
NAME = "name"
PROCESS = "process"
THREAD = "thread"
ATTRIBUTES = "attributes"

# event_type domain (reference pipit/readers/otf2_reader.py:293-297,
# pipit/readers/hpctoolkit_reader.py:1254,1289)
ENTER = "Enter"
LEAVE = "Leave"
INSTANT = "Instant"
LOOP_ENTER = "Loop Enter"
LOOP_LEAVE = "Loop Leave"
ENTER_TYPES = (ENTER, LOOP_ENTER)
LEAVE_TYPES = (LEAVE, LOOP_LEAVE)

# derived columns produced by the fused matching pass
MATCHING_EVENT = "matching_event_id"      # reference: _matching_event
MATCHING_TS = "matching_timestamp_ns"     # reference: _matching_timestamp
DEPTH = "depth"                           # reference: _depth
PARENT = "parent_event_id"                # reference: _parent
PARENT_NAME = "parent_name"               # caller's name, free in the kernel;
                                          # lets profile aggregations do the
                                          # child-subtraction without a
                                          # self-join on event ids
PARENT_NODE = "parent_node_id"            # caller's CCT node id, also free in
                                          # the kernel; makes create_cct a pure
                                          # distinct instead of a self-join
NODE_ID = "node_id"                       # reference: Graph_Node object column
TIME_INC = "time_inc"                     # reference: time.inc
TIME_EXC = "time_exc"                     # reference: time.exc

# promoted hot Attributes keys (reference reads these out of the dict in
# pipit/trace.py:412-416,424-428) -- promoting them to typed columns keeps
# the comm operators pure-columnar at scale.
ATTR_RECEIVER = "receiver"
ATTR_SENDER = "sender"
ATTR_MSG_LENGTH = "msg_length"

CORE_FIELDS = [
    T.StructField(EVENT_ID, T.LongType(), False),
    T.StructField(TIMESTAMP, T.LongType(), False),
    T.StructField(SEQ, T.LongType(), False),
    T.StructField(EVENT_TYPE, T.StringType(), False),
    T.StructField(NAME, T.StringType(), True),
    T.StructField(PROCESS, T.IntegerType(), False),
    T.StructField(THREAD, T.IntegerType(), True),
    T.StructField(ATTRIBUTES, T.MapType(T.StringType(), T.StringType()), True),
]

EVENT_SCHEMA = T.StructType(CORE_FIELDS)

# definitions table (reference pipit/readers/otf2_reader.py:424-434)
DEFINITIONS_SCHEMA = T.StructType(
    [
        T.StructField("def_type", T.StringType(), False),
        T.StructField("id", T.LongType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# CCT node table replacing the object graph (reference pipit/graph.py:7-98)
CCT_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("parent_node_id", T.LongType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

# reference's MPI event-name sets (pipit/trace.py:400-404,470-476)
SEND_NAMES = ("MpiSend", "MpiIsend")
RECV_NAMES = ("MpiRecv", "MpiIrecv")

MATCH_FIELDS = [
    T.StructField(MATCHING_EVENT, T.LongType(), True),
    T.StructField(MATCHING_TS, T.LongType(), True),
    T.StructField(DEPTH, T.IntegerType(), True),
    T.StructField(PARENT, T.LongType(), True),
    T.StructField(PARENT_NAME, T.StringType(), True),
    T.StructField(NODE_ID, T.LongType(), True),
    T.StructField(PARENT_NODE, T.LongType(), True),
]


def matched_schema(input_schema: T.StructType, metric_cols: list[str]) -> T.StructType:
    """Schema of the fused matching pass output: input columns + derived
    match/stack columns + one ``<metric>_inc`` double per metric column
    (``time_inc`` for the timestamp)."""
    fields = list(input_schema.fields) + list(MATCH_FIELDS)
    fields.append(T.StructField(TIME_INC, T.DoubleType(), True))
    for m in metric_cols:
        fields.append(T.StructField(f"{m}_inc", T.DoubleType(), True))
    return T.StructType(fields)
