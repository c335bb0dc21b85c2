"""Declared schemas for the engine.

The reference is schemaless (dynamic JSON records, ``src/parsers/ndjsonParser.js:54``);
we replace that with explicit declared StructTypes — the documented semantic is
"declared schema wins": missing fields → null, extra fields → dropped
(PERMISSIVE parse, SURVEY.md §1.2/§1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical input table (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Broadcast enrichment dimension (FIXTURES.md §2).
LOOKUP_SCHEMA = T.StructType(
    [
        T.StructField("role", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("team", T.StringType(), True),
        T.StructField("cost_weight", T.DoubleType(), True),
        T.StructField("sla_ms", T.IntegerType(), True),
    ]
)

# logpipe-parity log record (reference scripts/generate-ndjson.js:211-227),
# declared instead of inferred.
LOG_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("level", T.StringType(), True),
        T.StructField("service", T.StringType(), True),
        T.StructField("method", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("responseTime", T.IntegerType(), True),
        T.StructField("userId", T.StringType(), True),
        T.StructField("sessionId", T.StringType(), True),
        T.StructField("ip", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("payloadSize", T.LongType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("env", T.StringType(), True),
                    T.StructField("host", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("errorCode", T.StringType(), True),
    ]
)

# Multimodal asset table: opaque binary payload + typed metadata (round brief).
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)
