"""Source-connector tests (S1–S4): NDJSON error channel, CSV options,
format dispatch, gzip transparency — mirroring the reference's error corpus
(``scripts/generate-ndjson-errors.js``)."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

from logpipe_spark.sources import (read_csv, read_ndjson, read_source,
                                   sniff_format)

SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
])

GOOD = [
    {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi"},
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "hello"},
    {"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "x"},
]


def _write_ndjson(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_sniff_format():
    assert sniff_format("a/b/logs.ndjson") == "ndjson"
    assert sniff_format("logs.jsonl") == "ndjson"
    assert sniff_format("logs.json") == "ndjson"
    assert sniff_format("logs.csv") == "csv"
    assert sniff_format("logs.csv.gz") == "csv"        # double-extension peek
    assert sniff_format("logs.ndjson.gz") == "ndjson"
    assert sniff_format("noext") == "ndjson"           # default
    assert sniff_format("x.csv", explicit="json") == "ndjson"  # explicit wins


def test_ndjson_error_channel(spark, tmp_path):
    lines = [json.dumps(r) for r in GOOD]
    lines.insert(1, "")                      # blank → skipped
    lines.insert(2, "   ")                   # whitespace-only → skipped
    lines.insert(3, "{not valid json")       # malformed → error channel
    lines.append('{"conv_id": "c3", "extra_field": 1}')  # extra → dropped by schema
    f = tmp_path / "logs.ndjson"
    _write_ndjson(f, lines)
    df = read_ndjson(spark, str(f), SCHEMA)
    rows = df.collect()
    # blanks skipped entirely: 3 good + 1 malformed + 1 partial
    assert len(rows) == 5
    bad = [r for r in rows if r.error_kind == "malformed"]
    assert len(bad) == 1 and bad[0].raw == "{not valid json"
    partial = [r for r in rows if r.conv_id == "c3"]
    assert len(partial) == 1 and partial[0].turn_idx is None  # missing → null
    good = df.filter(F.col("error_kind").isNull()).count()
    assert good == 4


def test_ndjson_gzip_transparent(spark, tmp_path):
    f = tmp_path / "logs.ndjson.gz"
    with gzip.open(f, "wt") as g:
        for r in GOOD:
            g.write(json.dumps(r) + "\n")
    df = read_source(spark, str(f), SCHEMA)
    assert df.filter(F.col("error_kind").isNull()).count() == 3


def test_csv_options_and_string_semantics(spark, tmp_path):
    f = tmp_path / "logs.csv"
    f.write_text("conv_id;turn_idx;role;text\n"
                 "c1;0;user;'hello; world'\n"
                 "c2;1;tool;plain\n")
    df = read_csv(spark, str(f), separator=";", quote="'", header=True)
    rows = {r.conv_id: r for r in df.collect()}
    assert rows["c1"].text == "hello; world"
    # all-strings semantics (reference never coerces)
    assert dict(df.dtypes)["turn_idx"] == "string"
    assert rows["c2"].turn_idx == "1"


def test_csv_with_schema_coerces(spark, tmp_path):
    f = tmp_path / "logs.csv"
    f.write_text("conv_id,turn_idx,role,text\nc1,7,user,hi\n")
    df = read_csv(spark, str(f), schema=SCHEMA)
    r = df.collect()[0]
    assert r.turn_idx == 7 and isinstance(r.turn_idx, int)


def test_read_source_dispatch_parquet(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([("c1", 0, "user", "hi")], SCHEMA).write.parquet(p)
    df = read_source(spark, p, SCHEMA, fmt="parquet")
    assert df.count() == 1


def test_synth_determinism_and_skew(spark):
    from logpipe_spark.synth import synth_transcripts

    a = synth_transcripts(spark, n_turns=2000, n_convs=50,
                          error_every=20, hot_conv_fraction=0.5)
    b = synth_transcripts(spark, n_turns=2000, n_convs=50,
                          error_every=20, hot_conv_fraction=0.5)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    counts = dict(a.groupBy("conv_id").count().collect())
    assert counts["conv-000000"] == 1000  # hot conversation holds 50%
    blanks = a.filter(F.trim("text") == "").count()
    garbled = a.filter(F.col("text").startswith("garbled")).count()
    assert blanks == 2000 // 40 and garbled == 2000 // 20 - blanks
    # (conv_id, turn_idx) is a dense unique key
    dup = a.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    assert dup == 0


def test_ndjson_five_malformed_kinds(spark, tmp_path):
    """The reference error corpus's five malformed kinds
    (generate-ndjson-errors.js:145-153) + blanks: all five land on the
    error channel, blanks are skipped, valid rows parse."""
    malformed = [
        '{ "conv_id": "c1", "turn_idx": 0, ',        # missing closing brace
        '{ conv_id: "c1", "turn_idx": 0 }',          # unquoted key
        '{ "conv_id": "c1", "text": "trailing", }',  # trailing comma
        "not a json line at all",                    # plain text
        '{ "conv_id": "c1"  "turn_idx": 0 }',        # missing comma
    ]
    lines = [json.dumps(r) for r in GOOD]
    for i, m in enumerate(malformed):
        lines.insert(i, m)
    lines.insert(2, "")  # blank
    f = tmp_path / "err.ndjson"
    _write_ndjson(f, lines)
    df = read_ndjson(spark, str(f), SCHEMA)
    rows = df.collect()
    assert len(rows) == len(GOOD) + len(malformed)  # blank skipped
    bad = [r.raw for r in rows if r.error_kind == "malformed"]
    assert sorted(bad) == sorted(malformed)
    good = [r for r in rows if r.error_kind is None]
    assert len(good) == len(GOOD)


def test_csv_skip_lines(spark, tmp_path):
    f = tmp_path / "skip.csv"
    f.write_text("# generated by tool v1\n# do not edit\n"
                 "conv_id,turn_idx,role,text\nc1,0,user,hi\nc2,1,tool,yo\n")
    df = read_csv(spark, str(f), schema=SCHEMA, skip_lines=2)
    rows = {r.conv_id: r for r in df.collect()}
    assert set(rows) == {"c1", "c2"} and rows["c2"].turn_idx == 1


def test_csv_skip_lines_multi_file(spark, tmp_path):
    """Per-FILE skip: every file's preamble is dropped, not just the global
    first N lines (the old monotonic-id path skipped only one file's worth
    and dropped good rows from whichever file happened to sort first)."""
    d = tmp_path / "csvs"
    d.mkdir()
    for i in range(3):
        (d / f"part{i}.csv").write_text(
            "# preamble one\n# preamble two\n"
            f"conv_id,turn_idx,role,text\nc{i},0,user,hi{i}\nc{i},1,tool,yo{i}\n")
    df = read_csv(spark, str(d), schema=SCHEMA, skip_lines=2)
    rows = df.collect()
    assert len(rows) == 6                      # 2 data rows per file
    assert {r.conv_id for r in rows} == {"c0", "c1", "c2"}
    assert all(r.role in {"user", "tool"} for r in rows)


def test_csv_skip_lines_no_schema_infers_header_names(spark, tmp_path):
    f = tmp_path / "skip2.csv"
    f.write_text("junk line\na;b\n1;'x;y'\n2;z\n")
    df = read_csv(spark, str(f), separator=";", quote="'", skip_lines=1)
    assert df.columns == ["a", "b"]
    rows = sorted(df.collect(), key=lambda r: r.a)
    assert rows[0].b == "x;y" and rows[1].a == "2"      # quote honored, strings


def test_ndjson_scalar_lines_route_to_error(spark, tmp_path):
    """Documented policy: non-object JSON lines (scalars, null) route to the
    error channel instead of becoming silently-clean all-null rows (the
    reference's JSON.parse accepts them as records; routed is recoverable)."""
    lines = [json.dumps(GOOD[0]), "5", '"x"', "true", "null"]
    f = tmp_path / "scalars.ndjson"
    _write_ndjson(f, lines)
    df = read_ndjson(spark, str(f), SCHEMA)
    rows = df.collect()
    assert len(rows) == 5
    bad = sorted(r.raw for r in rows if r.error_kind == "malformed")
    assert bad == sorted(["5", '"x"', "true", "null"])


def test_sniff_format_parquet():
    assert sniff_format("data.parquet") == "parquet"
    assert sniff_format("a/b/part-0001.parquet") == "parquet"


def test_read_source_dispatch_orc(spark, tmp_path):
    """ORC is a first-class columnar source: extension sniff + schema-forced
    read, same straight-through dispatch as parquet."""
    p = str(tmp_path / "t.orc")
    spark.createDataFrame(
        [("c1", 0, "user", "hi"), ("c2", 1, "assistant", "yo")], SCHEMA
    ).write.orc(p)
    assert sniff_format(p) == "orc"
    df = read_source(spark, p, SCHEMA)      # no explicit fmt: sniffed
    rows = {(r.conv_id, r.turn_idx) for r in df.collect()}
    assert rows == {("c1", 0), ("c2", 1)}


def test_ndjson_whitespace_semantics(spark, tmp_path):
    """Tab-indented valid JSON is a clean record (Jackson skips leading
    whitespace); whitespace-only lines are blank-skipped — F.trim only
    strips ASCII spaces, so both used to misfire."""
    from logpipe_spark.schemas import TRANSCRIPT_SCHEMA
    from logpipe_spark.sources.readers import read_ndjson

    f = tmp_path / "t.ndjson"
    f.write_text('\t{"conv_id":"c1","turn_idx":1}\n'
                 '\t\n   \n'
                 '{"conv_id":"c2","turn_idx":2}\n'
                 'nope\n')
    rows = read_ndjson(spark, str(f), TRANSCRIPT_SCHEMA).collect()
    assert len(rows) == 3
    kinds = {r.conv_id: r.error_kind for r in rows}
    assert kinds["c1"] is None and kinds["c2"] is None
    assert sum(1 for r in rows if r.error_kind == "malformed") == 1


def test_csv_skip_lines_blank_after_preamble(spark, tmp_path):
    """A blank line between the skipped preamble and the header: the
    header is the first NON-BLANK line after the skip, per file — the
    old literal _idx == skip_lines probe raised or demoted the real
    header to a data row."""
    from logpipe_spark.sources.readers import read_csv

    f = tmp_path / "x.csv"
    f.write_text("junk1\njunk2\n\na,b\n1,2\n3,4\n")
    out = read_csv(spark, str(f), schema=None, header=True, skip_lines=2)
    assert out.columns == ["a", "b"]
    assert sorted((r.a, r.b) for r in out.collect()) == [("1", "2"), ("3", "4")]


def test_props_rigid_shape(spark):
    """The assertion TRANSCRIPTS_SQL's substring k-extract is built on
    (promised in its header comment): every driver-generated props is
    exactly '{"k": N}' at every scale factor. If this ever fails, the
    substring fast path must fall back to regexp_extract — format drift
    corrupts k identically in engine and oracle, so only this direct
    shape check can catch it."""
    import os

    from logpipe_spark.transcripts import props_shape_violations

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/events.parquet"
        if not os.path.exists(p):
            continue
        ev = spark.read.parquet(p)
        bad = props_shape_violations(ev)
        assert bad.limit(1).count() == 0, \
            f"{sf}: props drifted from rigid shape: {bad.head(3)}"
    # the check itself rejects drifted shapes (no-space, extra keys, null)
    drifted = spark.createDataFrame(
        [('{"k":3}',), ('{"k": 3, "j": 4}',), (None,), ('{"k": 12}',)],
        "props string")
    assert props_shape_violations(drifted).count() == 3
