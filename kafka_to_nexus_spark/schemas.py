"""Message-envelope and payload schemas.

Mirrors the reference's logical record: Kafka envelope
``MessageMetaData{Timestamp(ms), Offset, Partition, topic}``
(reference ``src/Msg.h:20-31``) + the FlatbufferMessage tuple
``(schema_id, source_name, timestamp_ns, payload)``
(reference ``src/FlatbufferMessage.cpp:41-74``).

Design note (Spark-first): rather than a per-schema tagged union, the
envelope is one flat DataFrame with nullable per-schema payload columns.
That keeps everything columnar/prunable — a query touching only f144's
``value`` never reads ev44's arrays (parquet column pruning), and every
filter stays inside whole-stage codegen. Unsigned reference dtypes widen
to the next signed Spark type and carry their logical dtype in plan
metadata (narrowed back by the sink) — see SURVEY.md §1.5.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Schema IDs the engine understands (reference registers extractors per ID
# under src/AccessMessageMetadata/; writer modules under src/WriterModule/).
SCHEMA_IDS = ("f144", "ev44", "se00", "ad00", "da00", "al00", "ep01", "tdct")

# --- envelope ---------------------------------------------------------------
# One row per message. `timestamp` is event time in **nanoseconds** (payload
# domain; reference converts fixture ms → ns, FlatBufferGenerators.h:35).
# `kafka_timestamp` is the broker envelope time in **milliseconds**.
ENVELOPE_FIELDS = [
    T.StructField("topic", T.StringType()),
    T.StructField("partition", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("kafka_timestamp", T.LongType()),
    T.StructField("schema", T.StringType()),
    T.StructField("source_name", T.StringType()),
    T.StructField("timestamp", T.LongType()),
]

# --- per-schema payload columns (nullable; present when schema matches) -----
PAYLOAD_FIELDS = [
    # f144 scalar log (fixture generator emits double; dtype config narrows)
    T.StructField("value", T.DoubleType()),
    # ep01 EPICS connection status (string enum in fixtures → int16 code)
    T.StructField("connection_status", T.StringType()),
    # al00 alarm
    T.StructField("severity", T.StringType()),
    T.StructField("message", T.StringType()),
    # ev44 neutron events
    T.StructField("message_id", T.LongType()),
    T.StructField("reference_time", T.ArrayType(T.LongType())),
    T.StructField("reference_time_index", T.ArrayType(T.IntegerType())),
    T.StructField("time_of_flight", T.ArrayType(T.IntegerType())),
    T.StructField("pixel_ids", T.ArrayType(T.IntegerType())),
    # ad00 area detector: flattened frame + explicit dimensions
    T.StructField("data", T.ArrayType(T.DoubleType())),
    T.StructField("dimensions", T.ArrayType(T.LongType())),
    # da00 data array (single-variable fixture form)
    T.StructField("name", T.StringType()),
    T.StructField("axis_name", T.StringType()),
    T.StructField("axis_values", T.ArrayType(T.DoubleType())),
    # da00 full multi-variable form: every Variable in the message
    # (da00_Writer.cpp:45-140; one struct per da00_Variable table entry)
    T.StructField(
        "da00_variables",
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("unit", T.StringType()),
                    T.StructField("label", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("data_type", T.StringType()),
                    T.StructField("axes", T.ArrayType(T.StringType())),
                    T.StructField("shape", T.ArrayType(T.LongType())),
                    T.StructField("data", T.ArrayType(T.DoubleType())),
                ]
            )
        ),
    ),
    # se00 sample environment
    T.StructField("packet_timestamp", T.LongType()),
    T.StructField("time_delta", T.DoubleType()),
    T.StructField("timestamps", T.ArrayType(T.LongType())),
    T.StructField("values", T.ArrayType(T.DoubleType())),
]

MESSAGE_SCHEMA = T.StructType(ENVELOPE_FIELDS + PAYLOAD_FIELDS)

# ep01 ConnectionInfo codes (public streaming-data-types ep01 schema;
# golden: CONNECTED → 2, domain-tests/test_writer_modules.py:66-74).
CONNECTION_INFO_CODES = {
    "ConnectionInfo::UNKNOWN": 0,
    "ConnectionInfo::NEVER_CONNECTED": 1,
    "ConnectionInfo::CONNECTED": 2,
    "ConnectionInfo::DISCONNECTED": 3,
    "ConnectionInfo::DESTROYED": 4,
}

# al00 Severity codes (public streaming-data-types al00 schema).
SEVERITY_CODES = {
    "Severity::OK": 0,
    "Severity::MINOR": 1,
    "Severity::MAJOR": 2,
    "Severity::INVALID": 3,
}

# Reference dtype name → (Spark type, widened?) — unsigned types widen to the
# next signed type; the sink narrows them back using the logical dtype tag.
DTYPE_MAP: dict[str, tuple[T.DataType, bool]] = {
    "int8": (T.ByteType(), False),
    "uint8": (T.ShortType(), True),
    "int16": (T.ShortType(), False),
    "uint16": (T.IntegerType(), True),
    "int32": (T.IntegerType(), False),
    "uint32": (T.LongType(), True),
    "int64": (T.LongType(), False),
    "uint64": (T.LongType(), True),  # best effort: no wider integral type
    "float32": (T.FloatType(), False),
    "float": (T.FloatType(), False),
    "float64": (T.DoubleType(), False),
    "double": (T.DoubleType(), False),
    "string": (T.StringType(), False),
}


def spark_type_for(dtype: str) -> T.DataType:
    """Spark type for a reference dtype name (default 'double',
    reference f144_Writer.h:83). Unknown names fall back to double like
    the reference's out_of_range handler (f144_Writer.cpp:72-77 logs
    'Unknown data type … Using double.')."""
    got = DTYPE_MAP.get(dtype)
    if got is None:
        import logging

        logging.getLogger(__name__).info(
            "unknown data type %r; using double", dtype
        )
        return T.DoubleType()
    return got[0]
