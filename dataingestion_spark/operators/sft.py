"""SFT conversation rendering: chat templates + loss-mask offsets.

The reference pipeline ends at enriched chunks / vector records
(``VectorStoreWriter.cs``); turning curated text into *supervised
fine-tuning* examples is the next hop a training-data platform needs.
The two jobs here are the standard ones:

* :func:`render_messages` — apply a ChatML-style template to a
  ``(conv_id, pos, role, content)`` message stream and compute each
  message's **character offsets** inside the rendered conversation.
  The offset of message *i* is the sum of the rendered lengths of
  messages ``0..i-1`` — one window cumulative sum per conversation,
  no UDF, no second pass. This is what makes loss masking possible
  downstream without re-tokenizing: the trainer masks everything
  outside the assistant spans.
* :func:`render_chat` — fold the rendered pieces back into one row per
  conversation: the full prompt string plus the assistant span list
  (the loss mask in character space).
* :func:`token_loss_mask` — project the character-space mask onto a
  whitespace token stream: a token participates in the loss iff its
  character interval overlaps an assistant span. Expressed as an
  interval-overlap join (token intervals x span intervals, equi-keyed
  by conversation), so Catalyst plans it as a hash join on ``conv_id``
  with the overlap predicate as a residual filter — no per-row Python.

Scale shape: everything is expression-only / whole-stage codegen. The
cumulative-sum window shuffles once on ``conv_id`` (conversations are
small and numerous — no skew concern); ``render_chat`` reuses the same
partitioning, and AQE coalesces the tiny post-agg partitions. At 100 TB
the text never moves more than once: pieces are rendered where the rows
sit, and only the grouped fold shuffles them.

Template markers follow the ChatML convention (``<|role|>\\n`` ...
``<|end|>\\n``) but are parameters — any header/footer pair works, and
the oracle SQL builder mirrors whatever is passed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "render_messages",
    "render_chat",
    "token_loss_mask",
    "render_messages_sql",
    "render_chat_sql",
    "token_loss_mask_sql",
    "preference_pairs",
    "best_of_n",
]


def _piece(role: Column, content: Column, end_marker: str) -> Column:
    return F.concat(F.lit("<|"), role, F.lit("|>\n"), content, F.lit(end_marker))


def render_messages(df: DataFrame, *, id_col: str = "conv_id",
                    pos_col: str = "pos", role_col: str = "role",
                    content_col: str = "content",
                    end_marker: str = "<|end|>\n") -> DataFrame:
    """One row per message with its rendered piece and [start, end)
    character offsets inside the conversation's rendered text.

    ``start`` is the cumulative rendered length of all earlier messages
    (by ``pos_col``) in the same conversation; ``content_start`` /
    ``content_end`` bound just the content (what a loss mask actually
    wants — the role header and end marker stay masked even inside
    assistant turns)."""
    piece = _piece(F.col(role_col), F.col(content_col), end_marker)
    w = (Window.partitionBy(id_col).orderBy(pos_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    header_len = F.length(F.col(role_col)) + F.lit(5)  # "<|" + "|>" + "\n"
    out = (df
           .withColumn("piece", piece)
           .withColumn("piece_len", F.length("piece").cast("long"))
           .withColumn("start_off",
                       F.coalesce(F.sum("piece_len").over(w), F.lit(0)).cast("long")))
    return (out
            .withColumn("end_off", (F.col("start_off") + F.col("piece_len")).cast("long"))
            .withColumn("content_start", (F.col("start_off") + header_len).cast("long"))
            .withColumn("content_end",
                        (F.col("content_start") + F.length(content_col)).cast("long"))
            .drop("piece_len"))


def render_messages_sql(msgs_sql: str, *, id_col: str = "conv_id",
                        pos_col: str = "pos", role_col: str = "role",
                        content_col: str = "content",
                        end_marker: str = "<|end|>\n") -> str:
    """DuckDB twin of :func:`render_messages` over a message-stream CTE."""
    marker = end_marker.replace("\n", "' || chr(10) || '")
    return f"""
WITH msgs AS ({msgs_sql}),
pieces AS (
  SELECT {id_col}, {pos_col}, {role_col}, {content_col},
         '<|' || {role_col} || '|>' || chr(10) || {content_col} || '{marker}' AS piece
  FROM msgs
)
SELECT {id_col}, {pos_col}, {role_col}, piece,
       CAST(COALESCE(SUM(length(piece)) OVER (
            PARTITION BY {id_col} ORDER BY {pos_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off,
       CAST(SUM(length(piece)) OVER (
            PARTITION BY {id_col} ORDER BY {pos_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off,
       CAST(COALESCE(SUM(length(piece)) OVER (
            PARTITION BY {id_col} ORDER BY {pos_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + length({role_col}) + 5 AS BIGINT) AS content_start,
       CAST(COALESCE(SUM(length(piece)) OVER (
            PARTITION BY {id_col} ORDER BY {pos_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + length({role_col}) + 5 + length({content_col}) AS BIGINT) AS content_end
FROM pieces
"""


def render_chat(rendered: DataFrame, *, id_col: str = "conv_id",
                pos_col: str = "pos", role_col: str = "role",
                mask_role: str = "assistant") -> DataFrame:
    """Fold :func:`render_messages` output into one row per conversation:
    ``text`` (the full rendered prompt), ``n_msgs``, ``mask_chars`` (total
    characters under the loss mask), and ``first_mask_start``.

    The span list itself stays relational (join the per-message frame
    when the trainer needs it); the scalars here are what a curation
    report wants and what a cross-engine oracle can hash exactly."""
    is_masked = F.col(role_col) == mask_role
    folded = (rendered
              .groupBy(id_col)
              .agg(F.array_sort(F.collect_list(F.struct(pos_col, "piece"))).alias("_ps"),
                   F.count("*").cast("long").alias("n_msgs"),
                   F.sum(F.when(is_masked,
                                F.col("content_end") - F.col("content_start"))
                         .otherwise(F.lit(0))).cast("long").alias("mask_chars"),
                   F.min(F.when(is_masked, F.col("content_start")))
                    .cast("long").alias("first_mask_start")))
    text = F.array_join(F.transform("_ps", lambda s: s["piece"]), "")
    return folded.select(id_col, text.alias("text"), "n_msgs", "mask_chars",
                         "first_mask_start")


def render_chat_sql(msgs_sql: str, *, id_col: str = "conv_id",
                    pos_col: str = "pos", role_col: str = "role",
                    content_col: str = "content",
                    end_marker: str = "<|end|>\n",
                    mask_role: str = "assistant") -> str:
    """DuckDB twin of :func:`render_chat` (composes the offsets CTE)."""
    inner = render_messages_sql(msgs_sql, id_col=id_col, pos_col=pos_col,
                                role_col=role_col, content_col=content_col,
                                end_marker=end_marker)
    return f"""
WITH rendered AS ({inner})
SELECT {id_col},
       string_agg(piece, '' ORDER BY {pos_col}) AS text,
       CAST(COUNT(*) AS BIGINT) AS n_msgs,
       CAST(COALESCE(SUM(CASE WHEN {role_col} = '{mask_role}'
                 THEN content_end - content_start ELSE 0 END), 0) AS BIGINT) AS mask_chars,
       CAST(MIN(CASE WHEN {role_col} = '{mask_role}'
                THEN content_start END) AS BIGINT) AS first_mask_start
FROM rendered
GROUP BY {id_col}
"""


def token_loss_mask(rendered: DataFrame, *, id_col: str = "conv_id",
                    pos_col: str = "pos", role_col: str = "role",
                    mask_role: str = "assistant") -> DataFrame:
    """Whitespace-token stream with a loss-mask bit, from the per-message
    frame produced by :func:`render_messages`.

    Tokens are the non-empty space-separated fields of each rendered
    piece (a field may span the template's newlines — alignment, not
    linguistics, is the contract); a token is in the loss iff its interval
    overlaps its message's content span AND the message's role is
    ``mask_role``. Token offsets are conversation-absolute, so the
    trainer can align them with any downstream tokenization.

    Shape: ``split`` + ``posexplode`` (expression-only), then a window
    cumulative sum per message for intra-piece offsets. No join needed —
    the span test is against the token's own message, which travels on
    the same row."""
    toks = (rendered
            .select(id_col, pos_col, role_col, "start_off",
                    "content_start", "content_end",
                    F.posexplode(F.split("piece", " ", -1)).alias("tok_idx", "tok")))
    # offset of token k inside the piece = sum of (len + 1 separator) of
    # earlier split fields — exact because split on a single space keeps
    # empty fields, so lengths reconstruct positions losslessly.
    w = (Window.partitionBy(id_col, pos_col).orderBy("tok_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    toks = (toks
            .withColumn("tok_start",
                        (F.col("start_off")
                         + F.coalesce(F.sum(F.length("tok") + 1).over(w), F.lit(0)))
                        .cast("long"))
            .withColumn("tok_end", (F.col("tok_start") + F.length("tok")).cast("long"))
            .filter(F.length("tok") > 0))
    in_loss = ((F.col(role_col) == mask_role)
               & (F.col("tok_start") < F.col("content_end"))
               & (F.col("content_start") < F.col("tok_end")))
    return toks.select(id_col, pos_col, "tok", "tok_start", "tok_end",
                       in_loss.cast("boolean").alias("in_loss"))


def token_loss_mask_sql(msgs_sql: str, *, id_col: str = "conv_id",
                        pos_col: str = "pos", role_col: str = "role",
                        content_col: str = "content",
                        end_marker: str = "<|end|>\n",
                        mask_role: str = "assistant") -> str:
    """DuckDB twin of :func:`token_loss_mask`."""
    inner = render_messages_sql(msgs_sql, id_col=id_col, pos_col=pos_col,
                                role_col=role_col, content_col=content_col,
                                end_marker=end_marker)
    return f"""
WITH rendered AS ({inner}),
tok AS (
  SELECT {id_col}, {pos_col}, {role_col}, start_off, content_start, content_end,
         unnest(string_split(piece, ' ')) AS tok,
         CAST(generate_subscripts(string_split(piece, ' '), 1) - 1 AS BIGINT) AS tok_idx
  FROM rendered
),
off AS (
  SELECT *,
         CAST(start_off + COALESCE(SUM(length(tok) + 1) OVER (
              PARTITION BY {id_col}, {pos_col} ORDER BY tok_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM tok
)
SELECT {id_col}, {pos_col}, tok, tok_start,
       CAST(tok_start + length(tok) AS BIGINT) AS tok_end,
       ({role_col} = '{mask_role}'
        AND tok_start < content_end
        AND content_start < tok_start + length(tok)) AS in_loss
FROM off
WHERE length(tok) > 0
"""


def preference_pairs(df: DataFrame, *, prompt_col: str = "prompt_id",
                     completion_col: str = "completion",
                     score_col: str = "score",
                     margin: float = 0.0) -> DataFrame:
    """Preference-pair preparation for DPO/RLHF reward modelling: from a
    ``(prompt, completion, score)`` stream, emit one ``(prompt, chosen,
    rejected, chosen_score, rejected_score)`` row per prompt — chosen =
    the highest-scored completion, rejected = the lowest — keeping only
    prompts where the gap exceeds ``margin`` (equal-score prompts carry
    no preference signal and are dropped at margin 0).

    Deterministic under score ties: ``max_by``/``min_by`` on the
    ``(score, completion)`` struct makes the lexicographically greatest
    completion win among tied maxima (and least lose among tied minima),
    so results are engine-reproducible — the oracle restates the same
    tie-break with ``arg_max``/``arg_min`` on the paired struct.

    Scale shape: ONE groupBy on the prompt key (map-side combinable
    aggregates, no window, no self-join); completion text moves through
    the shuffle once. Skewed prompts (millions of completions for one
    prompt) reduce fine — max/min are commutative."""
    by_score = F.struct(F.col(score_col), F.col(completion_col))
    agg = (
        df.groupBy(prompt_col)
        .agg(
            F.max_by(F.col(completion_col), by_score).alias("chosen"),
            F.min_by(F.col(completion_col), by_score).alias("rejected"),
            F.max(score_col).alias("chosen_score"),
            F.min(score_col).alias("rejected_score"),
        )
    )
    return agg.filter(
        F.col("chosen_score") - F.col("rejected_score") > F.lit(margin))


def best_of_n(df: DataFrame, *, prompt_col: str = "prompt_id",
              completion_col: str = "completion",
              score_col: str = "score", n: int = 1) -> DataFrame:
    """Rejection sampling (best-of-n): keep the top ``n`` completions per
    prompt by score, ranked deterministically (score desc, completion
    asc as the tie-break). One window on the prompt key; rows carry
    ``rank`` (1 = best). The distillation shape: oversample, score with
    a reward model, keep the winners."""
    w = Window.partitionBy(prompt_col).orderBy(
        F.desc(score_col), F.asc(completion_col))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )
