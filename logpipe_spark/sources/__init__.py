"""Input connectors (SURVEY.md §2.1 S1–S4): NDJSON, CSV, format dispatch.

Gzip transparency (S1, ``src/readers/fileReader.js:17-42``) is native to
every Spark text-based reader — ``.gz`` files decompress in the scan with no
configuration. Byte-offset resume is deliberately NOT ported (the reference's
is broken on gzip and never fires, SURVEY.md §2.7); resumability lives in
:mod:`logpipe_spark.plans.checkpoint` as snapshot-based stage skipping.
"""

from logpipe_spark.sources.readers import (  # noqa: F401
    observe_malformed,
    read_csv,
    read_ndjson,
    read_source,
    sniff_format,
)
