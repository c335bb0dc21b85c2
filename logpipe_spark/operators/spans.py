"""Conversation spans + per-turn window analytics (north_star additions).

The reference has no window functions (SURVEY.md §2.4); the north_rule adds
conversation spans over ``conv_id`` ordered by ``turn_idx``. Two shapes:

- :func:`conv_spans` — per-conversation min/max ts + turn count. A plain
  groupBy (single shuffle on conv_id; no window needed — cheaper at scale).
- :func:`with_turn_latency` — per-turn ``lag`` over
  ``Window.partitionBy(conv_id).orderBy(turn_idx)`` for inter-turn latency.

Skew: one hot conversation holding 50% of turns makes the window partition a
straggler; :mod:`logpipe_spark.operators.skew` provides the salted two-phase
variant for the groupBy shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(c) -> "F.Column":
    # parquet timestamps arrive as TIMESTAMP_NTZ in Spark 4; unix_micros wants
    # TIMESTAMP — with session tz UTC the cast is wall-clock identity.
    return F.unix_micros(c.cast("timestamp"))


def conv_spans(df: DataFrame) -> DataFrame:
    # span_seconds is a RAW quotient of an exact integer-micros diff —
    # rounding a deterministic ratio is the cross-engine divergence trap
    # (Spark BigDecimal.valueOf vs DuckDB scale-and-round disagree when
    # the shortest repr ends in …5; CLAUDE.md round() rule). sessionize
    # below was already in the raw form.
    return df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        ((_micros(F.max("ts")) - _micros(F.min("ts"))) / F.lit(1e6))
        .alias("span_seconds"),
    )


def with_turn_latency(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_ts = F.lag("ts").over(w)
    return df.withColumn(
        "latency_seconds",
        (_micros(F.col("ts")) - _micros(prev_ts)) / F.lit(1e6),
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Batch gap-based sessionization: split each key's ordered event stream
    into sessions wherever the inter-event gap exceeds ``gap_seconds``.

    The batch twin of ``streaming.conversation_sessions`` (event-time
    timeout sessions): session boundaries are a lag-gap indicator summed
    cumulatively — one shuffle on ``key`` + one sort, linear, the same
    plan shape as any per-key window. ``session_idx`` is 0-based per key.

    Output: one row per (key, session) with event count, start/end ts and
    the session span as a RAW double of integer micros / 1e6 (bit-identical
    cross-engine; see CLAUDE.md round() note).
    """
    order = [F.col(ts).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    gap_us = int(gap_seconds) * 1_000_000
    prev = F.lag(F.col(ts)).over(w)
    is_new = F.when(
        prev.isNull() | (_micros(F.col(ts)) - _micros(prev) > gap_us), 1
    ).otherwise(0)
    cum = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_session = df.withColumn("session_idx", (F.sum(is_new).over(cum) - 1).cast("int"))
    return with_session.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        ((_micros(F.max(ts)) - _micros(F.min(ts))) / F.lit(1e6)).alias("span_seconds"),
    )


def sessionize_segmented(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    gap_seconds: int = 1800,
    segment_seconds: int = 86400,
    tiebreak: str | None = None,
) -> DataFrame:
    """Skew-proof :func:`sessionize` — identical output, but the per-key
    window runs per (key, time segment), so one hot key splits across its
    segments (order-sensitive windows cannot be salted; this is the same
    prefix decomposition as ``asof_join_segmented``).

    Phase 1 sessionizes each (key, segment) locally. Phase 2 re-runs the
    SAME lag-gap pass over the per-session summaries (one row per local
    session — rows ∝ sessions, not events): intra-segment summary gaps
    exceed the threshold by construction, so only boundary-adjacent
    sessions can merge, and chains spanning many segments merge
    transitively through the running sum. Phase 3 merges counts/extents
    per chain.
    """
    order = [F.col(ts).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    gap_us = int(gap_seconds) * 1_000_000
    seg = F.floor(
        _micros(F.col(ts)) / F.lit(int(segment_seconds) * 1_000_000)
    ).cast("long")
    w1 = Window.partitionBy(key, "_seg").orderBy(*order)
    c1 = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts)).over(w1)
    is_new = F.when(
        prev.isNull() | (_micros(F.col(ts)) - _micros(prev) > gap_us), 1
    ).otherwise(0)
    local = (
        df.withColumn("_seg", seg)
        .withColumn("_ls", F.sum(is_new).over(c1))
        .groupBy(key, "_seg", "_ls")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(ts).alias("_start"),
            F.max(ts).alias("_end"),
        )
    )
    w2 = Window.partitionBy(key).orderBy("_start", "_end")
    c2 = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_end = F.lag("_end").over(w2)
    chain_new = F.when(
        prev_end.isNull()
        | (_micros(F.col("_start")) - _micros(prev_end) > gap_us),
        1,
    ).otherwise(0)
    chained = local.withColumn(
        "session_idx", (F.sum(chain_new).over(c2) - 1).cast("int")
    )
    return chained.groupBy(key, "session_idx").agg(
        F.sum("_n").cast("bigint").alias("n_events"),
        F.min("_start").alias("session_start"),
        F.max("_end").alias("session_end"),
        (
            (_micros(F.max("_end")) - _micros(F.min("_start"))) / F.lit(1e6)
        ).alias("span_seconds"),
    )


def turn_numbering(df: DataFrame) -> DataFrame:
    """row_number over (conv_id, ts) — recomputes turn order from timestamps."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    return df.withColumn("rn", F.row_number().over(w) - F.lit(1))


def sequence_gaps(df: DataFrame, id_col: str = "event_id",
                  bucket_width: int = 1 << 16) -> DataFrame:
    """Missing-id ranges in a monotone sequence — the "did we drop
    events?" audit a log pipeline runs on a sequenced feed (the reference
    counts records in/out per stage, src/utils/progressTracker.js; this
    finds WHICH records vanished).

    The naive formulation is lag(id) over a GLOBAL order — a single-task
    sort at 100 TB. Distributed form: bucket ids by floor(id / W); then
    every consecutive-id pair is either (a) inside one bucket — found by
    a per-bucket lag window, shuffled on the bucket key, embarrassingly
    parallel — or (b) across buckets — found by lag over the per-bucket
    (min, max) SUMMARY frame, which has n/W rows (millions of buckets for
    trillions of ids: trivially window-able; wholly-absent buckets are
    covered because the summary lag spans them). Union of (a) + (b) is
    exactly the global-lag gap set.

    Returns (gap_start, gap_end) inclusive ranges, one row per gap.
    """
    ids = df.select(F.col(id_col).cast("bigint").alias("id"))
    b = ids.withColumn("bucket", F.floor(F.col("id") / F.lit(bucket_width)))
    w_in = Window.partitionBy("bucket").orderBy("id")
    prev = F.lag("id").over(w_in)
    internal = (
        b.withColumn("prev", prev)
        .filter(F.col("prev").isNotNull() & (F.col("id") - F.col("prev") > 1))
        .select(
            (F.col("prev") + 1).cast("bigint").alias("gap_start"),
            (F.col("id") - 1).cast("bigint").alias("gap_end"),
        )
    )
    summary = b.groupBy("bucket").agg(
        F.min("id").alias("mn"), F.max("id").alias("mx")
    )
    # n/W-row frame: the single-partition window is bounded by design.
    w_b = Window.orderBy("bucket")
    prev_mx = F.lag("mx").over(w_b)
    boundary = (
        summary.withColumn("prev_mx", prev_mx)
        .filter(F.col("prev_mx").isNotNull() & (F.col("mn") - F.col("prev_mx") > 1))
        .select(
            (F.col("prev_mx") + 1).cast("bigint").alias("gap_start"),
            (F.col("mn") - 1).cast("bigint").alias("gap_end"),
        )
    )
    return internal.unionByName(boundary)


def value_streaks(
    df: DataFrame,
    key: str,
    value: str,
    order_cols: list[str],
) -> DataFrame:
    """Gaps-and-islands streak detection: for every (key, value), the
    longest CONSECUTIVE run of that value in the key's ordered event
    stream, plus the number of distinct runs ("did this user fire 14
    errors in a row, or 14 scattered ones?" — the run-shape question
    counts alone cannot answer).

    Gaps-and-islands via change-point flags, NOT the textbook
    two-row_number trick: ``rn_key − rn_(key,value)`` needs a SECOND
    exchange (the two row_numbers partition differently), while
    ``island = running_sum(value ≠ lag(value))`` keeps both window
    functions on the SAME (key)-partitioned sort — one Exchange, one
    Sort, the two window operators chained over it (asserted in tests).
    The only other shuffle is the run-length groupBy (map-side
    combinable).

    ``order_cols`` must be a deterministic total order per key (include
    a unique tiebreaker — same discipline as every ordered op here).
    Returns (key, value, longest_streak, n_streaks, n_rows).
    """
    w = Window.partitionBy(key).orderBy(*order_cols)
    # null-safe change flag (IS DISTINCT FROM): plain != returns NULL
    # against a NULL value and would silently merge runs across it;
    # eqNullSafe treats NULL as one more value with its own runs
    chg = F.when(
        F.col(value).eqNullSafe(F.lag(value).over(w)), 0).otherwise(1)
    islands = df.select(
        key, value,
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("_island"),
    )
    runs = islands.groupBy(key, value, "_island").agg(
        F.count(F.lit(1)).cast("bigint").alias("_len"))
    return runs.groupBy(key, value).agg(
        F.max("_len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.sum("_len").cast("bigint").alias("n_rows"),
    )


def context_growth(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Context-window overflow audit: per conversation, the running token
    total in turn order and the FIRST turn whose cumulative count exceeds
    ``budget`` — "which conversations outgrow an N-token context, and
    when?", the planning input for truncation / packing policies
    (trainprep/curate.py:pack_sequences consumes exactly this budget).

    Returns one row per conversation: (conv, n_turns, total_tokens,
    overflow_turn, tokens_at_overflow); the last two are NULL for
    conversations that never exceed the budget.

    Plan: ONE shuffle on the conversation key — the expanding-frame
    cumulative sum is the incremental O(n) direction (never UNBOUNDED
    FOLLOWING, see BENCH.md), and the first-overflow argmin is a
    min-struct aggregate over the same frame, not a second window pass.
    All values are exact integers.
    """
    w = (
        Window.partitionBy(conv_col).orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = df.select(
        F.col(conv_col).alias("conv"),
        F.col(order_col).alias("turn"),
        F.col(tokens_col).cast("bigint").alias("tok"),
        F.sum(F.col(tokens_col).cast("bigint")).over(w).alias("cum"),
    )
    return cum.groupBy("conv").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.max("cum").cast("bigint").alias("total_tokens"),
        F.min(
            F.when(
                F.col("cum") > budget,
                F.struct(F.col("turn").alias("turn"),
                         F.col("cum").alias("cum")),
            )
        ).alias("_o"),
    ).select(
        F.col("conv").alias(conv_col),
        "n_turns",
        "total_tokens",
        F.col("_o.turn").cast("int").alias("overflow_turn"),
        F.col("_o.cum").cast("bigint").alias("tokens_at_overflow"),
    )


def apdex_by_tool(df: DataFrame, sla_scale: int = 1) -> DataFrame:
    """Apdex SLO scorecard per tool: each turn's latency (integer
    micros between consecutive turns of its conversation) judged
    against ITS OWN (role, tool) SLA from the broadcast lookup
    dimension — satisfied <= T, tolerating <= 4T,
    apdex = (2·sat + tol) / (2·n), one division of exact integer
    counts. One conv-partitioned lag window + one map-side-combinable
    shuffle to tool cardinality. The batch twin of
    ``streaming.stream_apdex`` (same pairs: consecutive turn_idx
    within conv, judged by the LATER turn's SLA). ``sla_scale``
    multiplies every SLA (tests rebase the ms-scale dimension onto a
    seconds-scale fixture; production leaves it 1).
    """
    from logpipe_spark.transcripts import lookup_df

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lat = (F.unix_micros(F.col("ts").cast("timestamp"))
           - F.unix_micros(F.lag("ts").over(w).cast("timestamp")))
    lk = lookup_df(df.sparkSession).select("role", "tool", "sla_ms")
    j = (df.withColumn("_lat", lat.cast("bigint"))
         .where(F.col("_lat").isNotNull())
         .join(F.broadcast(lk), ["role", "tool"]))
    thr = F.col("sla_ms").cast("bigint") * 1000 * int(sla_scale)
    g = j.groupBy("tool").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(F.when(F.col("_lat") <= thr, 1).otherwise(0))
        .cast("bigint").alias("n_satisfied"),
        F.sum(F.when((F.col("_lat") > thr) & (F.col("_lat") <= 4 * thr), 1)
              .otherwise(0)).cast("bigint").alias("n_tolerating"))
    return g.select(
        "tool", "n_turns", "n_satisfied", "n_tolerating",
        ((2 * F.col("n_satisfied") + F.col("n_tolerating")).cast("double")
         / (2 * F.col("n_turns")).cast("double")).alias("apdex"))


def turn_taking(df: DataFrame) -> DataFrame:
    """Per-conversation turn-taking profile: how often does the ROLE
    actually change hands? A healthy assistant loop alternates
    (user -> assistant -> tool -> assistant ...); a conversation that
    degenerates into long single-role runs is a retry storm or a
    runaway agent — the conversational-dynamics sibling of
    ``value_streaks`` (which is value-based and generic).

    One lag window per conv (the sessionize partition discipline),
    then exact integer counts:

        alternation_rate = switches / (n_turns - 1)
        avg_run_len      = n_turns / (switches + 1)

    (a k-run conversation has exactly k-1 switches, so the run count
    needs no second pass). Raw doubles of exact int64s, NULL-guarded
    for 1-turn convs.

    Returns ``(conv_id, n_turns, n_switches, n_roles,
    alternation_rate, avg_run_len)``.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    r = df.select("conv_id", "role",
                  F.lag("role").over(w).alias("_pr"))
    g = r.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(F.when(F.col("_pr").isNotNull()
                     & (F.col("role") != F.col("_pr")), 1)
              .otherwise(0)).cast("bigint").alias("n_switches"),
        F.countDistinct("role").cast("bigint").alias("n_roles"))
    return g.select(
        "conv_id", "n_turns", "n_switches", "n_roles",
        F.when(F.col("n_turns") > 1,
               F.col("n_switches").cast("double")
               / (F.col("n_turns") - 1)).alias("alternation_rate"),
        (F.col("n_turns").cast("double") / (F.col("n_switches") + 1))
        .alias("avg_run_len"))


def topic_boundaries(turns: DataFrame, key: str = "conv_id",
                     order_col: str = "turn_idx",
                     text_col: str = "text",
                     threshold: float = 0.15) -> DataFrame:
    """TextTiling-style topic segmentation over a conversation: the
    cosine similarity between each adjacent turn pair's token-count
    vectors, with low-cohesion gaps flagged as topic boundaries
    (Hearst, CL 1997) — the chunk-by-topic pass a RAG pipeline runs
    before embedding long transcripts.

    Determinism: token-count vectors are integers, so the dot product
    (one (key, token) equi-join between adjacent turns) and both
    squared norms are exact int64; cosine is ``dot / sqrt(n1 · n2)``
    on doubles cast from those integers — bit-identical cross-engine.
    Plan: one (key, turn, token) count shuffle; the dot join shuffles
    on (key, token) — narrow, token-cardinality fan-out; boundary rows
    with NO shared token come from the norms self-join with the dot
    LEFT-joined and coalesced to 0 (an inner dot join would silently
    drop exactly the strongest boundaries).

    Returns ``(key, boundary_turn, cos, is_boundary)`` for every
    adjacent pair where both sides have tokens.
    """
    toks = (turns.where(F.col(text_col).isNotNull()
                        & F.col(key).isNotNull())
            .select(F.col(key).alias("_k"),
                    F.col(order_col).alias("_t"),
                    F.explode(F.split(F.col(text_col), " "))
                    .alias("_tok")))
    counts = toks.groupBy("_k", "_t", "_tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"))
    norms = counts.groupBy("_k", "_t").agg(
        F.sum(F.col("_c") * F.col("_c")).cast("bigint").alias("_n2"))
    nb = norms.select(F.col("_k"), (F.col("_t") - 1).alias("_t"),
                      F.col("_n2").alias("_n2b"))
    pairs = norms.join(nb, ["_k", "_t"])
    dots = (counts.join(
        counts.select(F.col("_k"), (F.col("_t") - 1).alias("_t"),
                      F.col("_tok"), F.col("_c").alias("_cb")),
        ["_k", "_t", "_tok"])
        .groupBy("_k", "_t")
        .agg(F.sum(F.col("_c") * F.col("_cb")).cast("bigint")
             .alias("_dot")))
    j = (pairs.join(dots, ["_k", "_t"], "left")
         .select("_k", "_t", "_n2", "_n2b",
                 F.coalesce("_dot", F.lit(0)).cast("bigint")
                 .alias("_dot")))
    cos = (F.col("_dot").cast("double")
           / F.sqrt(F.col("_n2").cast("double")
                    * F.col("_n2b").cast("double")))
    return j.select(
        F.col("_k").alias(key),
        (F.col("_t") + 1).cast("int").alias("boundary_turn"),
        cos.alias("cos"),
        (cos < threshold).alias("is_boundary"))


def speaker_dominance(turns: DataFrame, key: str = "conv_id",
                      role_col: str = "role",
                      text_col: str = "text") -> DataFrame:
    """Per-conversation speaker dominance: which role holds the
    largest share of the conversation's characters, and how large —
    the monologue detector (a runaway assistant or a copy-paste user
    shows up as share → 1 long before reading transcripts; Sacks et
    al.'s turn-taking economy, reduced to one ratio). Complements
    :func:`turn_taking` (alternation) with volume.

    One (key, role) char-sum collapse; the winner is a PARTITIONED
    rank under the total order (chars desc, role asc) — deterministic
    at ties; the share is one division of exact int64 sums.

    Returns ``(key, dom_role, dom_chars, total_chars, share)``.
    """
    from pyspark.sql import Window

    per = (turns.where(F.col(key).isNotNull())
           .groupBy(F.col(key), F.col(role_col).alias("_r"))
           .agg(F.sum(F.length(F.col(text_col))).cast("bigint")
                .alias("_c")))
    tot = per.groupBy(key).agg(F.sum("_c").cast("bigint").alias("_t"))
    w = Window.partitionBy(key).orderBy(F.col("_c").desc(),
                                        F.col("_r").asc_nulls_last())
    top = (per.withColumn("_rn", F.row_number().over(w))
           .where(F.col("_rn") == 1))
    return (top.join(tot, key)
            .where(F.col("_t") > 0)
            .select(key, F.col("_r").alias("dom_role"),
                    F.col("_c").alias("dom_chars"),
                    F.col("_t").alias("total_chars"),
                    (F.col("_c").cast("double")
                     / F.col("_t").cast("double")).alias("share")))
