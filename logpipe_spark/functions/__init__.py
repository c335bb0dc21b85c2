"""Scalar function library: text analysis, hashing, vector math.

All JVM-side builtins or Arrow-batched pandas UDFs — never per-row Python
(input_hint), widening whole-stage-codegen spans wherever possible."""
