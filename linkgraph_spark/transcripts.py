"""Transcript table synthesis and ingestion.

The engine's primary input is a table of multi-turn conversation / agent
transcripts with schema ``(conv_id: string, turn_idx: int, role: string,
text: string, tool: string, ts: timestamp)``.

Two producers:

- :func:`synthesize_transcripts` — a fully deterministic, fully distributed
  generator (``spark.range`` + ``F.sequence``/``F.explode``; no driver-side
  loops, no wall clock, no randomness source other than fixed arithmetic),
  used by pytest fixtures and by the benchmark at arbitrary scale. This is
  the sandbox stand-in for the production Iceberg transcript table.
- :func:`transcripts_from_events` — a deterministic derivation from the
  driver-provided ``events`` parquet table, expressible identically in ANSI
  SQL so DuckDB can replay it for the correctness oracle.

Scale note: the generator is O(rows) with no shuffle — a single ``range``
scan exploded per-conv — so it parallelizes linearly to any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "calc", "browse", "exec"]

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    min_turns: int = 2,
    max_turns: int = 50,
    hub_turns: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic synthetic transcripts (FIXTURES.md F1).

    - ``turn_idx`` is 0..len(conv)-1, dense and unique per conv — the stable
      ordering key required by the per-turn text-equality invariant.
    - ``text`` is ``{conv_id}:{turn_idx}:{token}``, unique per row.
    - ``tool`` is non-null on a deterministic ~20% subset of assistant turns.
    - ``ts`` is a fixed epoch plus conv/turn offsets — never ``now()``.
    - ``hub_turns > 0`` appends one hub conversation whose every turn
      invokes tool "search": a hub vertex with ~100x degree that exercises
      the salting / hub-broadcast path.
    """
    span = max_turns - min_turns + 1
    convs = (
        spark.range(n_convs)
        .withColumn("conv_ord", F.col("id").cast("long"))
        .withColumn(
            "n_turns",
            (F.lit(min_turns) + (F.col("conv_ord") * 7919 + seed) % span).cast("int"),
        )
    )
    turns = convs.select(
        "conv_ord",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    role_arr = F.array(*[F.lit(r) for r in ROLES])
    tool_arr = F.array(*[F.lit(t) for t in TOOLS])
    phase = (F.col("conv_ord") * 131 + seed) % 4
    role = F.element_at(role_arr, ((phase + F.col("turn_idx")) % 4 + 1).cast("int"))
    token = F.pmod(F.col("conv_ord") * 1009 + F.col("turn_idx") * 9176 + seed, F.lit(99991))
    main = turns.select(
        F.format_string("conv%05d", F.col("conv_ord")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.col("conv_ord"),
        token.alias("token"),
    )
    main = main.select(
        "conv_id",
        "turn_idx",
        "role",
        F.format_string("%s:%d:t%d", F.col("conv_id"), F.col("turn_idx"), F.col("token")).alias(
            "text"
        ),
        F.when(
            (F.col("role") == "assistant")
            & ((F.col("conv_ord") * 31 + F.col("turn_idx") * 17) % 5 == 0),
            F.element_at(tool_arr, ((F.col("conv_ord") + F.col("turn_idx")) % 4 + 1).cast("int")),
        ).alias("tool"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(hours=F.col("conv_ord"), mins=F.col("turn_idx"))
        ).alias("ts"),
    )
    if hub_turns > 0:
        hub = spark.range(hub_turns).select(
            F.lit("convhub").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("assistant").alias("role"),
            F.format_string("convhub:%d:hub", F.col("id")).alias("text"),
            F.lit("search").alias("tool"),
            (
                F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                + F.make_interval(mins=F.col("id"))
            ).alias("ts"),
        )
        main = main.unionByName(hub)
    return main


def transcripts_from_events(
    spark: SparkSession, sf_dir: str, turns_per_conv: int = 8
) -> DataFrame:
    """Deterministically reshape the driver's ``events`` table into transcripts.

    Each user's event stream (ordered by ``ts, event_id`` — a total order
    since event_id is unique) is chopped into conversations of
    ``turns_per_conv`` turns. Role/tool/text are pure arithmetic on the
    event row, so DuckDB reproduces the table exactly (see
    ``__spark_entry__.oracle_sql``).
    """
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("_lg_events")
    return spark.sql(transcripts_from_events_sql(turns_per_conv, table="_lg_events"))


def transcripts_from_events_sql(turns_per_conv: int = 8, table: str = "events") -> str:
    """ANSI SQL for :func:`transcripts_from_events` — runs on Spark AND DuckDB."""
    return f"""
    WITH seq AS (
      SELECT event_id, user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
      FROM {table}
    )
    SELECT
      concat('u', CAST(user_id AS STRING), '_c',
             CAST(CAST(floor(rn / {turns_per_conv}) AS BIGINT) AS STRING)) AS conv_id,
      CAST(rn % {turns_per_conv} AS INT) AS turn_idx,
      CASE event_type
        WHEN 'purchase' THEN 'assistant'
        WHEN 'error'    THEN 'assistant'
        WHEN 'signup'   THEN 'system'
        ELSE 'user'
      END AS role,
      concat('e', CAST(event_id AS STRING), ':', event_type) AS text,
      CASE
        WHEN event_type IN ('purchase', 'error') AND event_id % 3 = 0 THEN
          CASE CAST(event_id % 4 AS INT)
            WHEN 0 THEN 'search' WHEN 1 THEN 'calc'
            WHEN 2 THEN 'browse' ELSE 'exec'
          END
      END AS tool,
      ts
    FROM seq
    """


def conv_stats(transcripts: DataFrame) -> DataFrame:
    """→ ``[conv_id, n_turns, n_roles, n_tool_calls, n_tools, user_frac]``
    — the per-conversation profile (turn volume, role diversity,
    tool-invocation count/diversity, user-turn fraction) a transcript
    curation pass filters on before graphing: degenerate single-role
    conversations and tool-free chats are the first rows dropped.

    Plan shape: ONE hash aggregate keyed on ``conv_id`` (map-side
    combinable; per-conversation state is bounded by turns-per-conv, not
    data volume). ``n_tool_calls``/``n_tools`` count non-NULL tools —
    identical NULL semantics in both engines.
    """
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.count("tool").alias("n_tool_calls"),
        F.countDistinct("tool").alias("n_tools"),
        F.round(
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
            * 1.0
            / F.count("*"),
            6,
        ).alias("user_frac"),
    )


def conv_stats_sql() -> str:
    """DuckDB oracle body for :func:`conv_stats` (expects the ``t``
    transcripts CTE in scope — compose after ``edges_sql``)."""
    return """
    SELECT conv_id, count(*) AS n_turns,
           count(DISTINCT role) AS n_roles,
           count(tool) AS n_tool_calls,
           count(DISTINCT tool) AS n_tools,
           round(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS user_frac
    FROM t GROUP BY conv_id
    """


def role_transitions(transcripts: DataFrame) -> DataFrame:
    """→ ``[src_role, dst_role, n_trans, prob]`` — adjacent-turn role
    transition estimates over conversations (the role-level Markov view
    of the same adjacency the edge derivation graphs): within each
    conversation ordered by ``turn_idx``, count src→dst role pairs and
    row-normalize per source role (6 dp, two exact integer-to-double
    divisions).

    Plan shape: one lead window partitioned by ``conv_id`` (bounded by
    turns-per-conv); the transition aggregate is at most |roles|² rows,
    so the normalizing totals are a broadcast join at any scale.
    """
    wl = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = transcripts.select(
        F.col("role").alias("src_role"),
        F.lead("role").over(wl).alias("dst_role"),
    )
    trans = (
        lagged.where(F.col("dst_role").isNotNull())
        .groupBy("src_role", "dst_role")
        .agg(F.count("*").alias("n_trans"))
    )
    totals = trans.groupBy("src_role").agg(F.sum("n_trans").alias("_tot"))
    return trans.join(F.broadcast(totals), "src_role").select(
        "src_role",
        "dst_role",
        "n_trans",
        F.round(F.col("n_trans") * 1.0 / F.col("_tot"), 6).alias("prob"),
    )


def role_transitions_sql() -> str:
    """DuckDB oracle body for :func:`role_transitions` (expects ``t``)."""
    return """
    rt_l AS (
      SELECT role AS src_role,
             lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS dst_role
      FROM t
    ),
    rt_t AS (
      SELECT src_role, dst_role, count(*) AS n_trans
      FROM rt_l WHERE dst_role IS NOT NULL GROUP BY 1, 2
    ),
    rt_s AS (SELECT src_role, sum(n_trans) AS tot FROM rt_t GROUP BY 1)
    SELECT t2.src_role, t2.dst_role, t2.n_trans,
           round(t2.n_trans * 1.0 / s.tot, 6) AS prob
    FROM rt_t t2 JOIN rt_s s USING (src_role)
    """


def tool_bigrams(transcripts: DataFrame) -> DataFrame:
    """→ ``[tool_a, tool_b, n, frac]`` — consecutive tool-invocation
    bigrams within conversations (turns without a tool are skipped, so
    ``tool_b`` is the NEXT tool the conversation invoked): the workflow-
    mining view of agent behavior — which tool follows which. ``frac``
    is each bigram's share of all bigrams (6 dp).

    Plan shape: filter to tool turns (map-only), one lead window per
    conversation (bounded by turns-per-conv), then a |tools|²-bounded
    aggregate with a broadcast one-row total.
    """
    wl = Window.partitionBy("conv_id").orderBy("turn_idx")
    tooled = transcripts.where(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool"
    )
    pairs = tooled.select(
        F.col("tool").alias("tool_a"),
        F.lead("tool").over(wl).alias("tool_b"),
    ).where(F.col("tool_b").isNotNull())
    counted = pairs.groupBy("tool_a", "tool_b").agg(F.count("*").alias("n"))
    total = counted.agg(F.sum("n").alias("_t"))
    return counted.crossJoin(F.broadcast(total)).select(
        "tool_a",
        "tool_b",
        "n",
        F.round(F.col("n") * 1.0 / F.col("_t"), 6).alias("frac"),
    )


def tool_bigrams_sql() -> str:
    """DuckDB oracle body for :func:`tool_bigrams` (expects ``t``)."""
    return """
    tb_f AS (
      SELECT conv_id, turn_idx, tool FROM t WHERE tool IS NOT NULL
    ),
    tb_p AS (
      SELECT tool AS tool_a,
             lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS tool_b
      FROM tb_f
    ),
    tb_c AS (
      SELECT tool_a, tool_b, count(*) AS n
      FROM tb_p WHERE tool_b IS NOT NULL GROUP BY 1, 2
    ),
    tb_t AS (SELECT sum(n) AS tt FROM tb_c)
    SELECT c.tool_a, c.tool_b, c.n, round(c.n * 1.0 / t2.tt, 6) AS frac
    FROM tb_c c CROSS JOIN tb_t t2
    """


def turn_latency(transcripts: DataFrame) -> DataFrame:
    """→ ``[src_role, dst_role, n, p50, p90]`` — adjacent-turn response
    latency (seconds) per speaker-role pair: the gap between a turn and
    the conversation's NEXT turn, keyed by who spoke and who answered.
    The transcript SLA profile ("how fast does the assistant answer the
    user, vs how fast does the user come back") — exact interpolated
    percentiles, the ``inter_event_times``/``quantile_cont`` convention.

    Plan shape: one conv-keyed lead window (per-partition state bounded
    by a conversation's turn count), then one percentile aggregate on
    the ≤|roles|² key space."""
    wl = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select(
        "conv_id", "turn_idx", "role", F.unix_timestamp("ts").alias("ts_s")
    )
    lat = t.select(
        F.col("role").alias("src_role"),
        F.lead("role").over(wl).alias("dst_role"),
        (F.lead("ts_s").over(wl) - F.col("ts_s")).alias("gap"),
    ).where(F.col("dst_role").isNotNull())
    return lat.groupBy("src_role", "dst_role").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(gap, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(gap, 0.9)"), 6).alias("p90"),
    )


def turn_latency_sql(transcripts_relation: str) -> str:
    """DuckDB oracle for :func:`turn_latency` over a transcript relation
    (standalone query)."""
    return f"""
    WITH tl_t AS MATERIALIZED ({transcripts_relation}),
    tl_l AS (
      SELECT role AS src_role,
             lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst_role,
             CAST(floor(epoch(lead(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)))
                  AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) AS gap
      FROM tl_t
    )
    SELECT src_role, dst_role, count(*) AS n,
           round(quantile_cont(gap, 0.5), 6) AS p50,
           round(quantile_cont(gap, 0.9), 6) AS p90
    FROM tl_l WHERE dst_role IS NOT NULL
    GROUP BY 1, 2
    """


def role_token_share(transcripts: DataFrame) -> DataFrame:
    """→ ``[role, n_turns, n_chars, turn_share, char_share]`` — speaker
    dominance over the whole corpus: per role, the turn and character
    volume and its share of the totals. The one-glance balance audit a
    transcript-training pipeline runs before packing (an assistant-heavy
    corpus overweights the loss on generations; a user-heavy one on
    prompts), and the drift alarm between two crawls of the same source.

    Plan shape: ONE hash aggregate on the tiny ``role`` key, then the
    share normalization is a window over the handful of role rows —
    constant-size state everywhere after the scan.
    """
    agg = transcripts.groupBy("role").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    w = Window.partitionBy()
    return agg.select(
        "role",
        "n_turns",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.col("n_turns") / F.sum("n_turns").over(w), 6).alias("turn_share"),
        F.round(F.col("n_chars") / F.sum("n_chars").over(w), 6).alias("char_share"),
    )


def role_token_share_sql(transcripts_relation: str = "t") -> str:
    """DuckDB oracle body for :func:`role_token_share` (expects the
    transcript relation in scope under the given name)."""
    return f"""
    rts_agg AS (
      SELECT role, count(*) AS n_turns,
             CAST(sum(length(text)) AS BIGINT) AS n_chars
      FROM {transcripts_relation} GROUP BY role
    )
    SELECT role, n_turns, n_chars,
           round(n_turns / (sum(n_turns) OVER ()), 6) AS turn_share,
           round(n_chars / (sum(n_chars) OVER ()), 6) AS char_share
    FROM rts_agg
    """


def tool_usage(transcripts: DataFrame) -> DataFrame:
    """→ ``[tool, n_calls, n_convs, call_share, avg_turn_idx]`` — the
    per-tool usage profile: how often each tool fires, how many distinct
    conversations touch it, its share of all tool calls, and the mean
    turn index at which it is invoked (early-turn tools are lookup-ish,
    late-turn tools are resolution-ish — the cheap behavioral signature
    for tool-routing audits and deprecation decisions).

    Plan shape: one filter + ONE hash aggregate on the tiny ``tool``
    key (count-distinct on conv_id is the only sub-aggregate); the
    share is a window over |tools| rows. Map-side combinable
    throughout.
    """
    calls = transcripts.where(F.col("tool").isNotNull())
    agg = calls.groupBy("tool").agg(
        F.count("*").alias("n_calls"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.round(F.avg("turn_idx"), 6).alias("avg_turn_idx"),
    )
    w = Window.partitionBy()
    return agg.select(
        "tool",
        "n_calls",
        "n_convs",
        F.round(F.col("n_calls") / F.sum("n_calls").over(w), 6).alias("call_share"),
        "avg_turn_idx",
    )


def tool_usage_sql(transcripts_relation: str = "t") -> str:
    """DuckDB oracle body for :func:`tool_usage` (expects the transcript
    relation in scope under the given name)."""
    return f"""
    tu_agg AS (
      SELECT tool, count(*) AS n_calls,
             count(DISTINCT conv_id) AS n_convs,
             round(avg(turn_idx), 6) AS avg_turn_idx
      FROM {transcripts_relation} WHERE tool IS NOT NULL GROUP BY tool
    )
    SELECT tool, n_calls, n_convs,
           round(n_calls / (sum(n_calls) OVER ()), 6) AS call_share,
           avg_turn_idx
    FROM tu_agg
    """


def tool_chain_depth(transcripts: DataFrame) -> DataFrame:
    """→ ``[depth, n_convs]`` — the tool-chain depth histogram: per
    conversation, the LONGEST run of consecutive tool-invoking turns
    (``tool IS NOT NULL``, ordered by ``turn_idx``), bucketed into how
    many conversations peak at each depth (depth 0 = never calls a
    tool). Deep chains are agentic multi-step sessions — the rows a
    tool-use training mix wants upweighted — while a depth histogram
    collapsing to 1 says the "agent" corpus is single-shot lookups.
    Classic gaps-and-islands: run id = ``turn_idx − row_number()``
    within the conv's tool turns.

    Scale shape: one conv-keyed window (bounded by turns-per-conv, the
    same argument as ``sessionize``), two hash aggregates down to one
    row per conv, then the tiny depth-keyed histogram aggregate.
    """
    from pyspark.sql import Window

    tool_turns = transcripts.where(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx"
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    runs = tool_turns.select(
        "conv_id",
        (F.col("turn_idx") - F.row_number().over(w)).alias("grp"),
    )
    run_len = runs.groupBy("conv_id", "grp").agg(F.count("*").alias("len"))
    per_conv = run_len.groupBy("conv_id").agg(F.max("len").alias("depth"))
    all_convs = transcripts.select("conv_id").distinct()
    depth = all_convs.join(per_conv, "conv_id", "left").select(
        F.coalesce("depth", F.lit(0)).cast("long").alias("depth")
    )
    return depth.groupBy("depth").agg(F.count("*").alias("n_convs"))


def tool_chain_depth_sql(transcripts_relation: str = "t") -> str:
    """DuckDB oracle body for :func:`tool_chain_depth` (expects the
    transcript relation in scope under the given name)."""
    return f"""
    tcd_runs AS (
      SELECT conv_id,
             turn_idx - row_number() OVER (PARTITION BY conv_id
                                           ORDER BY turn_idx) AS grp
      FROM {transcripts_relation} WHERE tool IS NOT NULL
    ),
    tcd_len AS (
      SELECT conv_id, grp, count(*) AS len
      FROM tcd_runs GROUP BY conv_id, grp
    ),
    tcd_per AS (
      SELECT conv_id, max(len) AS depth FROM tcd_len GROUP BY conv_id
    ),
    tcd_all AS (
      SELECT c.conv_id, CAST(coalesce(p.depth, 0) AS BIGINT) AS depth
      FROM (SELECT DISTINCT conv_id FROM {transcripts_relation}) c
      LEFT JOIN tcd_per p ON p.conv_id = c.conv_id
    )
    SELECT depth, count(*) AS n_convs FROM tcd_all GROUP BY depth
    """


def qa_length_corr(transcripts: DataFrame) -> DataFrame:
    """→ one-row ``[n_pairs, corr, avg_q_chars, avg_a_chars]`` — does a
    longer question buy a longer answer? Over every adjacent
    user→assistant turn pair (by ``turn_idx`` within a conversation),
    the Pearson correlation between prompt and reply character lengths
    plus both means. Near-zero correlation with a high reply mean is
    the template-response smell (the assistant says the same amount no
    matter what was asked); strongly negative flags truncation. A
    packing planner also reads the two means directly. Zero-variance
    or <2 pairs → NULL correlation, pinned identically in both engines.

    Scale shape: ONE conv-keyed lead window (bounded by turns-per-conv)
    + one global moment aggregate. No joins.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    p = transcripts.select(
        "role",
        F.length("text").cast("double").alias("q"),
        F.lead("role").over(w).alias("nrole"),
        F.lead(F.length("text").cast("double")).over(w).alias("a"),
    ).where((F.col("role") == "user") & (F.col("nrole") == "assistant"))
    mom = p.agg(
        F.count("*").alias("n_pairs"),
        F.covar_pop("q", "a").alias("cv"),
        F.stddev_pop("q").alias("sq"),
        F.stddev_pop("a").alias("sa"),
        F.round(F.avg("q"), 6).alias("avg_q_chars"),
        F.round(F.avg("a"), 6).alias("avg_a_chars"),
    )
    return mom.select(
        "n_pairs",
        F.round(
            F.when(
                (F.col("sq") > 0) & (F.col("sa") > 0),
                F.col("cv") / (F.col("sq") * F.col("sa")),
            ),
            6,
        ).alias("corr"),
        "avg_q_chars",
        "avg_a_chars",
    )


def qa_length_corr_sql(transcripts_relation: str = "t") -> str:
    """DuckDB oracle body for :func:`qa_length_corr` (expects the
    transcript relation in scope under the given name)."""
    return f"""
    qa_p AS (
      SELECT role,
             CAST(length(text) AS DOUBLE) AS q,
             lead(role) OVER w AS nrole,
             lead(CAST(length(text) AS DOUBLE)) OVER w AS a
      FROM {transcripts_relation}
      WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
    ),
    qa_m AS (
      SELECT count(*) AS n_pairs, covar_pop(q, a) AS cv,
             stddev_pop(q) AS sq, stddev_pop(a) AS sa,
             round(avg(q), 6) AS avg_q_chars, round(avg(a), 6) AS avg_a_chars
      FROM qa_p WHERE role = 'user' AND nrole = 'assistant'
    )
    SELECT n_pairs,
           CASE WHEN sq > 0 AND sa > 0 THEN round(cv / (sq * sa), 6) END AS corr,
           avg_q_chars, avg_a_chars
    FROM qa_m
    """


def tool_latency(transcripts: DataFrame) -> DataFrame:
    """→ ``[tool, n, p50_gap, p90_gap, max_gap]`` — per-tool response
    latency: the seconds between a tool-invoking turn and the
    conversation's NEXT turn (any role), summarized as exact
    interpolated percentiles per tool. :func:`turn_latency` keys the
    same gap by speaker-role pair; this keys it by WHICH tool ran — the
    "which tool is slow" table an agent-ops dashboard leads with, and
    the regression alarm when one tool's p90 jumps after a deploy.
    Tool turns with no following turn (conversation enders) drop out.

    Scale shape: ONE conv-keyed lead window (bounded by turns-per-conv)
    + one hash aggregate on the tiny ``tool`` key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    p = transcripts.select(
        "tool",
        (
            F.lead(F.unix_timestamp("ts")).over(w) - F.unix_timestamp("ts")
        ).cast("double").alias("gap"),
    ).where(F.col("tool").isNotNull() & F.col("gap").isNotNull())
    return p.groupBy("tool").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(gap, 0.5D)"), 6).alias("p50_gap"),
        F.round(F.expr("percentile(gap, 0.9D)"), 6).alias("p90_gap"),
        F.max("gap").alias("max_gap"),
    )


def tool_latency_sql(transcripts_relation: str = "t") -> str:
    """DuckDB oracle body for :func:`tool_latency` (expects the
    transcript relation in scope under the given name)."""
    return f"""
    tl_p AS (
      SELECT tool,
             CAST(lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                  - CAST(floor(epoch(ts)) AS BIGINT) AS DOUBLE) AS gap
      FROM {transcripts_relation}
      WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
    )
    SELECT tool, count(*) AS n,
           round(quantile_cont(gap, 0.5), 6) AS p50_gap,
           round(quantile_cont(gap, 0.9), 6) AS p90_gap,
           max(gap) AS max_gap
    FROM tl_p
    WHERE tool IS NOT NULL AND gap IS NOT NULL
    GROUP BY tool
    """


def conv_arc(transcripts: DataFrame, n_bins: int = 10) -> DataFrame:
    """→ ``[bin, role, n_turns, share]`` — the conversation arc: every
    turn mapped to a relative-position bin (``floor(turn_idx·n_bins /
    n_turns)``, 0 = opening, n_bins−1 = closing) and counted per role,
    with each bin's role share. The shape report for a dialog corpus —
    healthy assistant data shows system mass pinned to bin 0 and
    user/assistant alternation through the middle; user mass
    accumulating at the end is the unanswered-question signature a
    training mix should downweight.

    Scale shape: one conv-keyed count aggregate joined back (both sides
    hash-partitioned on ``conv_id``), a map-only bin projection, one
    hash aggregate on the ≤ n_bins·|roles| key, and a share window over
    those cells.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    from pyspark.sql import Window

    lens = transcripts.groupBy("conv_id").agg(F.count("*").alias("n_turns_c"))
    b = F.floor(F.col("turn_idx") * n_bins / F.col("n_turns_c")).cast("int")
    binned = (
        transcripts.select("conv_id", "turn_idx", "role")
        .join(lens, "conv_id")
        .select(F.least(b, F.lit(n_bins - 1)).alias("bin"), "role")
    )
    cells = binned.groupBy("bin", "role").agg(F.count("*").alias("n_turns"))
    w = Window.partitionBy("bin")
    return cells.select(
        "bin",
        "role",
        "n_turns",
        F.round(F.col("n_turns") / F.sum("n_turns").over(w), 6).alias("share"),
    )


def conv_arc_sql(transcripts_relation: str = "t", n_bins: int = 10) -> str:
    """DuckDB oracle body for :func:`conv_arc` (expects the transcript
    relation in scope under the given name)."""
    B = int(n_bins)
    return f"""
    ca_len AS (
      SELECT conv_id, count(*) AS n_turns_c
      FROM {transcripts_relation} GROUP BY conv_id
    ),
    ca_b AS (
      SELECT least(CAST(floor(t.turn_idx * {B} / l.n_turns_c) AS INTEGER),
                   {B - 1}) AS bin,
             t.role
      FROM {transcripts_relation} t JOIN ca_len l ON l.conv_id = t.conv_id
    ),
    ca_c AS (
      SELECT bin, role, count(*) AS n_turns FROM ca_b GROUP BY bin, role
    )
    SELECT bin, role, n_turns,
           round(n_turns / (sum(n_turns) OVER (PARTITION BY bin)), 6) AS share
    FROM ca_c
    """


def tool_jaccard(transcripts: DataFrame) -> DataFrame:
    """→ ``[tool_a, tool_b, n_a, n_b, inter, jaccard]`` — conversation-set
    overlap between tools: for every unordered tool pair, the Jaccard of
    the sets of conversations that invoked each. :func:`tool_bigrams`
    counts ADJACENT invocations; this is the workflow-composition view —
    tools that always co-occur are one capability split across two
    names (bundle them in the training mix), tools that never do are
    alternative routes. All pairs emitted, including zero overlap.

    Scale shape: one (tool, conv) dedup aggregate, one conv-keyed
    self-equi-join (each conversation contributes ≤ |its tools|² rows),
    a |tools|-row pair spine.
    """
    tc = (
        transcripts.where(F.col("tool").isNotNull())
        .select("tool", "conv_id")
        .distinct()
    )
    cnt = tc.groupBy("tool").agg(F.count("*").alias("n"))
    a = tc.select(F.col("tool").alias("tool_a"), "conv_id")
    b = tc.select(F.col("tool").alias("tool_b"), "conv_id")
    inter = (
        a.join(b, "conv_id")
        .where(F.col("tool_a") < F.col("tool_b"))
        .groupBy("tool_a", "tool_b")
        .agg(F.count("*").alias("inter"))
    )
    ca = cnt.select(F.col("tool").alias("tool_a"), F.col("n").alias("n_a"))
    cb = cnt.select(F.col("tool").alias("tool_b"), F.col("n").alias("n_b"))
    pairs = ca.crossJoin(cb).where(F.col("tool_a") < F.col("tool_b"))
    return pairs.join(inter, ["tool_a", "tool_b"], "left").select(
        "tool_a",
        "tool_b",
        "n_a",
        "n_b",
        F.coalesce("inter", F.lit(0)).alias("inter"),
        F.round(
            F.coalesce("inter", F.lit(0))
            / (F.col("n_a") + F.col("n_b") - F.coalesce("inter", F.lit(0))),
            6,
        ).alias("jaccard"),
    )


def tool_jaccard_sql(transcripts_relation: str = "t") -> str:
    """DuckDB oracle body for :func:`tool_jaccard` (expects the
    transcript relation in scope under the given name)."""
    return f"""
    tjx_tc AS (
      SELECT DISTINCT tool, conv_id FROM {transcripts_relation}
      WHERE tool IS NOT NULL
    ),
    tjx_c AS (SELECT tool, count(*) AS n FROM tjx_tc GROUP BY tool),
    tjx_i AS (
      SELECT a.tool AS tool_a, b.tool AS tool_b, count(*) AS inter
      FROM tjx_tc a JOIN tjx_tc b
        ON b.conv_id = a.conv_id AND a.tool < b.tool
      GROUP BY 1, 2
    )
    SELECT ca.tool AS tool_a, cb.tool AS tool_b,
           ca.n AS n_a, cb.n AS n_b,
           coalesce(i.inter, 0) AS inter,
           round(coalesce(i.inter, 0) * 1.0
                 / (ca.n + cb.n - coalesce(i.inter, 0)), 6) AS jaccard
    FROM tjx_c ca
    JOIN tjx_c cb ON ca.tool < cb.tool
    LEFT JOIN tjx_i i ON i.tool_a = ca.tool AND i.tool_b = cb.tool
    """


# ---------------------------------------------------------------------------
# Wave 88: bipartite butterfly counting (conv x tool 4-cycles)
# ---------------------------------------------------------------------------


def _tool_conv_edges(transcripts: DataFrame, max_conv_tools: int | None) -> DataFrame:
    """Distinct ``(tool, conv_id)`` bipartite edge set; ``max_conv_tools``
    (when set) drops WHOLE conversations whose distinct-tool degree exceeds
    the cap BEFORE pair generation — the documented estimator change that
    bounds the per-conversation pair explode, same contract as the
    hot-shingle cap in :func:`linkgraph_spark.functions.dedup.ngram_jaccard_dups`."""
    tc = (
        transcripts.where(F.col("tool").isNotNull())
        .select("tool", "conv_id")
        .distinct()
    )
    if max_conv_tools is not None:
        keep = (
            tc.groupBy("conv_id")
            .agg(F.count("*").alias("__bf_d"))
            .where(F.col("__bf_d") <= max_conv_tools)
            .select("conv_id")
        )
        tc = tc.join(keep, "conv_id")
    return tc


def _tool_pair_co(tc: DataFrame) -> DataFrame:
    """Per unordered tool pair: ``co`` = number of conversations invoking
    both (the wedge count centered on conversations)."""
    a = tc.select(F.col("tool").alias("tool_a"), "conv_id")
    b = tc.select(F.col("tool").alias("tool_b"), "conv_id")
    return (
        a.join(b, "conv_id")
        .where(F.col("tool_a") < F.col("tool_b"))
        .groupBy("tool_a", "tool_b")
        .agg(F.count("*").alias("co"))
    )


def tool_butterflies(
    transcripts: DataFrame, max_conv_tools: int | None = None
) -> DataFrame:
    """→ ``[tool, butterflies]`` — per-tool butterfly (bipartite 4-cycle)
    participation over the conv×tool graph: two tools + two conversations,
    all four edges present. Butterflies are THE bipartite cohesion motif
    (Sanei-Mehri, Sariyüce & Tirthapura, KDD 2018 — public algorithm): a
    tool with many butterflies sits in stable multi-tool workflows; a
    butterfly-free tool co-occurs only incidentally. Exact integers, so
    the oracle hash is bit-stable.

    Per pair ``(a, b)`` sharing ``co`` conversations the pair contributes
    ``C(co, 2)`` butterflies to BOTH endpoints; tools in no pair report 0
    (left join from the tool spine — all tools appear).

    Scale shape: one distinct aggregate, one conv-keyed self-equi-join
    (each conversation contributes ≤ C(its tool count, 2) pair rows — tool
    degree per conversation is vocabulary-bounded; ``max_conv_tools``
    excises degenerate conversations when it is not), then a tool-keyed
    sum over the |tools|²-bounded pair table. No all-pairs over
    conversations anywhere. Reference parity: the reference has no
    bipartite analytics at all (its surface ends at PageRank,
    pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    tc = _tool_conv_edges(transcripts, max_conv_tools)
    bf = _tool_pair_co(tc).withColumn("bf", F.expr("(co * (co - 1)) DIV 2"))
    part = bf.select(F.col("tool_a").alias("tool"), "bf").unionByName(
        bf.select(F.col("tool_b").alias("tool"), "bf")
    )
    per_tool = part.groupBy("tool").agg(F.sum("bf").alias("bf_sum"))
    spine = tc.select("tool").distinct()
    return spine.join(per_tool, "tool", "left").select(
        "tool",
        F.coalesce("bf_sum", F.lit(0)).cast("long").alias("butterflies"),
    )


def tool_butterflies_sql(
    transcripts_relation: str = "t", max_conv_tools: int | None = None
) -> str:
    """DuckDB oracle body for :func:`tool_butterflies` (expects the
    transcript relation in scope under the given name)."""
    cap = (
        f"""bfx_keep AS (
      SELECT conv_id FROM bfx_tc0 GROUP BY conv_id
      HAVING count(*) <= {int(max_conv_tools)}
    ),
    bfx_tc AS (
      SELECT tc.tool, tc.conv_id FROM bfx_tc0 tc
      JOIN bfx_keep k ON k.conv_id = tc.conv_id
    ),"""
        if max_conv_tools is not None
        else "bfx_tc AS (SELECT tool, conv_id FROM bfx_tc0),"
    )
    return f"""
    bfx_tc0 AS (
      SELECT DISTINCT tool, conv_id FROM {transcripts_relation}
      WHERE tool IS NOT NULL
    ),
    {cap}
    bfx_co AS (
      SELECT a.tool AS tool_a, b.tool AS tool_b, count(*) AS co
      FROM bfx_tc a JOIN bfx_tc b
        ON b.conv_id = a.conv_id AND a.tool < b.tool
      GROUP BY 1, 2
    ),
    bfx_part AS (
      SELECT tool_a AS tool, (co * (co - 1)) // 2 AS bf FROM bfx_co
      UNION ALL
      SELECT tool_b AS tool, (co * (co - 1)) // 2 AS bf FROM bfx_co
    )
    SELECT s.tool, CAST(coalesce(p.bf_sum, 0) AS BIGINT) AS butterflies
    FROM (SELECT DISTINCT tool FROM bfx_tc) s
    LEFT JOIN (SELECT tool, sum(bf) AS bf_sum FROM bfx_part GROUP BY tool) p
      ON p.tool = s.tool
    """


def butterfly_stats(
    transcripts: DataFrame, max_conv_tools: int | None = None
) -> DataFrame:
    """→ one row ``[n_edges, n_tools, n_convs, n_wedges, n_butterflies]``
    — the global bipartite profile of the conv×tool graph: distinct
    edges, side cardinalities, conversation-centered wedges
    (Σ_conv C(tool-degree, 2)) and butterflies (Σ_pair C(co, 2)). The
    wedge→butterfly ratio is the standard density read on a bipartite
    network (Robins & Alexander 2004 lineage); both counts are exact
    integers so the oracle comparison is hash-stable.

    Scale shape: the same bounded conv-keyed self-join as
    :func:`tool_butterflies` plus two one-row aggregates; every sum is
    map-side combinable. The three single-row frames combine by cross
    join — O(1) rows move.
    """
    tc = _tool_conv_edges(transcripts, max_conv_tools)
    base = tc.agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("tool").alias("n_tools"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
    wed = (
        tc.groupBy("conv_id")
        .agg(F.count("*").alias("d"))
        .agg(
            F.coalesce(F.sum(F.expr("(d * (d - 1)) DIV 2")), F.lit(0))
            .cast("long")
            .alias("n_wedges")
        )
    )
    bfs = _tool_pair_co(tc).agg(
        F.coalesce(F.sum(F.expr("(co * (co - 1)) DIV 2")), F.lit(0))
        .cast("long")
        .alias("n_butterflies")
    )
    return base.crossJoin(wed).crossJoin(bfs)


def butterfly_stats_sql(
    transcripts_relation: str = "t", max_conv_tools: int | None = None
) -> str:
    """DuckDB oracle body for :func:`butterfly_stats`."""
    cap = (
        f"""bfs_keep AS (
      SELECT conv_id FROM bfs_tc0 GROUP BY conv_id
      HAVING count(*) <= {int(max_conv_tools)}
    ),
    bfs_tc AS (
      SELECT tc.tool, tc.conv_id FROM bfs_tc0 tc
      JOIN bfs_keep k ON k.conv_id = tc.conv_id
    ),"""
        if max_conv_tools is not None
        else "bfs_tc AS (SELECT tool, conv_id FROM bfs_tc0),"
    )
    return f"""
    bfs_tc0 AS (
      SELECT DISTINCT tool, conv_id FROM {transcripts_relation}
      WHERE tool IS NOT NULL
    ),
    {cap}
    bfs_co AS (
      SELECT a.tool AS tool_a, b.tool AS tool_b, count(*) AS co
      FROM bfs_tc a JOIN bfs_tc b
        ON b.conv_id = a.conv_id AND a.tool < b.tool
      GROUP BY 1, 2
    )
    SELECT e.n_edges, e.n_tools, e.n_convs,
           CAST(coalesce(w.n_wedges, 0) AS BIGINT) AS n_wedges,
           CAST(coalesce(bb.n_butterflies, 0) AS BIGINT) AS n_butterflies
    FROM (SELECT count(*) AS n_edges, count(DISTINCT tool) AS n_tools,
                 count(DISTINCT conv_id) AS n_convs FROM bfs_tc) e,
         (SELECT sum((d * (d - 1)) // 2) AS n_wedges
            FROM (SELECT count(*) AS d FROM bfs_tc GROUP BY conv_id)) w,
         (SELECT sum((co * (co - 1)) // 2) AS n_butterflies FROM bfs_co) bb
    """


def stuck_loops(transcripts: DataFrame, min_run: int = 3) -> DataFrame:
    """→ ``[conv_id, n_turns, max_run, max_run_state, n_loops]`` — the
    stuck-agent audit: per conversation, the longest consecutive run of
    identical ``(role, tool)`` turn states under stable ``turn_idx``
    ordering, which state it was (earliest such run on ties), and how many
    maximal runs reach ``min_run``.  An agent retrying the same tool call
    turn after turn is the classic runaway-loop failure; transcript
    curation drops or truncates these before the corpus ships.  Distinct
    from ``repetition_stats`` (text-level n-gram repeat) — this is
    turn-STATE repetition and catches loops whose text varies (new error
    message, same futile call).

    Plan shape: the standard gaps-and-islands — two windows partitioned by
    ``conv_id`` (bounded by turns-per-conv, never data volume) to tag
    runs, one per-run aggregate, one per-conversation argmax via
    ``max(struct(run_len, −start, state))`` (no second window).  NULL tool
    is its own state value (``'∅'`` sentinel), matching both engines."""
    state = F.concat_ws(
        "|", F.col("role"), F.coalesce(F.col("tool"), F.lit("∅"))
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ws = Window.partitionBy("conv_id", "st").orderBy("turn_idx")
    runs = (
        transcripts.select("conv_id", "turn_idx", state.alias("st"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("rs", F.row_number().over(ws))
        .withColumn("grp", F.col("rn") - F.col("rs"))
        .groupBy("conv_id", "st", "grp")
        .agg(
            F.count("*").alias("run_len"),
            F.min("turn_idx").alias("start"),
        )
    )
    return runs.groupBy("conv_id").agg(
        F.sum("run_len").cast("long").alias("n_turns"),
        F.max(
            F.struct(
                F.col("run_len").alias("l"),
                (-F.col("start")).alias("ns"),
                F.col("st").alias("s"),
            )
        ).alias("b"),
        F.sum(F.when(F.col("run_len") >= min_run, 1).otherwise(0))
        .cast("long")
        .alias("n_loops"),
    ).select(
        "conv_id",
        "n_turns",
        F.col("b.l").cast("long").alias("max_run"),
        F.col("b.s").alias("max_run_state"),
        "n_loops",
    )


def stuck_loops_sql(min_run: int = 3) -> str:
    """DuckDB oracle body for :func:`stuck_loops` (expects the ``t``
    transcripts CTE in scope)."""
    return f"""
    sl_st AS (
      SELECT conv_id, turn_idx,
             role || '|' || coalesce(tool, '∅') AS st,
             row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
             - row_number() OVER (PARTITION BY conv_id, role || '|' || coalesce(tool, '∅')
                                  ORDER BY turn_idx) AS grp
      FROM t
    ),
    sl_runs AS (
      SELECT conv_id, st, grp, count(*) AS run_len, min(turn_idx) AS start
      FROM sl_st GROUP BY conv_id, st, grp
    ),
    sl_best AS (
      SELECT conv_id, max(run_len) AS max_run
      FROM sl_runs GROUP BY conv_id
    ),
    sl_pick AS (
      SELECT r.conv_id, min(r.start) AS start
      FROM sl_runs r JOIN sl_best b
        ON b.conv_id = r.conv_id AND r.run_len = b.max_run
      GROUP BY r.conv_id
    )
    SELECT r.conv_id,
           CAST(s.n_turns AS BIGINT) AS n_turns,
           CAST(r.run_len AS BIGINT) AS max_run,
           r.st AS max_run_state,
           CAST(s.n_loops AS BIGINT) AS n_loops
    FROM sl_runs r
    JOIN sl_pick p ON p.conv_id = r.conv_id AND p.start = r.start
    JOIN (
      SELECT conv_id, sum(run_len) AS n_turns,
             sum(CASE WHEN run_len >= {int(min_run)} THEN 1 ELSE 0 END) AS n_loops
      FROM sl_runs GROUP BY conv_id
    ) s ON s.conv_id = r.conv_id
    """


def conv_templates(transcripts: DataFrame, min_convs: int = 2) -> DataFrame:
    """→ ``[flow_sig, n_convs, n_turns, flow_head]`` — conversation
    FLOW-template detection: two conversations share a template iff their
    complete ``(role, tool)`` turn sequences are identical under stable
    ``turn_idx`` order (text ignored — this catches scripted/bot traffic
    whose wording varies but whose choreography never does, the flow-level
    sibling of text dedup).  One row per template occurring in at least
    ``min_convs`` conversations; ``flow_sig`` is the portable 60-bit md5
    of the joined sequence, ``flow_head`` its first 3 states for human
    triage, ``n_turns`` the template length.

    Plan shape: per-conversation ``array_sort(collect_list(struct))`` —
    bounded by turns-per-conv, never data volume — one map to the flow
    string, one count aggregate on the signature.  No windows."""
    from linkgraph_spark.functions.hashing import md5_long

    state = F.concat_ws(
        "|", F.col("role"), F.coalesce(F.col("tool"), F.lit("∅"))
    )
    per_conv = (
        transcripts.select(
            "conv_id", F.struct(F.col("turn_idx").alias("i"), state.alias("s")).alias("t")
        )
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_list("t")).alias("ts"))
        .select(
            "conv_id",
            F.size("ts").alias("n_turns"),
            F.concat_ws(">", F.transform("ts", lambda x: x["s"])).alias("flow"),
        )
    )
    return (
        per_conv.groupBy("flow")
        .agg(
            F.count("*").cast("long").alias("n_convs"),
            F.max("n_turns").cast("long").alias("n_turns"),
        )
        .where(F.col("n_convs") >= int(min_convs))
        .select(
            md5_long(F.col("flow")).alias("flow_sig"),
            "n_convs",
            "n_turns",
            F.substring_index("flow", ">", 3).alias("flow_head"),
        )
    )


def conv_templates_sql(min_convs: int = 2) -> str:
    """DuckDB oracle body for :func:`conv_templates` (expects ``t``)."""
    return f"""
    ct_flow AS (
      SELECT conv_id, count(*) AS n_turns,
             string_agg(role || '|' || coalesce(tool, '∅'), '>'
                        ORDER BY turn_idx) AS flow
      FROM t GROUP BY conv_id
    ),
    ct_grp AS (
      SELECT flow, CAST(count(*) AS BIGINT) AS n_convs,
             CAST(max(n_turns) AS BIGINT) AS n_turns
      FROM ct_flow GROUP BY flow
      HAVING count(*) >= {int(min_convs)}
    )
    SELECT CAST(concat('0x', substr(md5(flow), 1, 15)) AS BIGINT) AS flow_sig,
           n_convs, n_turns,
           CASE WHEN len(string_split(flow, '>')) <= 3 THEN flow
                ELSE array_to_string((string_split(flow, '>'))[1:3], '>')
           END AS flow_head
    FROM ct_grp
    """
