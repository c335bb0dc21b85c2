"""Operators: Spark-first re-expressions of the reference's transformer set
(SURVEY.md §2) plus the large-scale training-data operators (dedup,
similarity, text analysis) the round brief adds as first-class components."""
