"""SFT (supervised fine-tuning) sample construction: conversations →
flattened training samples with per-turn loss-mask spans.

An instruction-tuning data loader needs, for every conversation, the token
offsets of the spans the loss applies to (assistant turns) inside the
flattened sequence — user turns are context only. This module keeps that
accounting engine-side as pure DataFrame expressions:

  - :func:`conversations` — deterministic conversation construction over a
    flat document corpus (``conv_id = doc_id div turns``, roles alternate
    user/assistant by turn parity). Real pipelines carry conversation ids
    in the source; the constructor exists so the mask/packing operators are
    exercisable and cross-engine checkable on the flat ``documents`` table.
  - :func:`loss_mask_spans` — per assistant turn, the ``[span_start,
    span_end)`` token-offset interval within the conversation's
    concatenated token stream. One window cumsum keyed by ``conv_id``.
  - :func:`sft_stats` — per conversation: turn counts, prompt vs
    completion token totals, and the loss-mask ratio (the fraction of
    tokens trained on — a mix-design diagnostic).
  - :func:`pack_conversations` — conversations → fixed-budget packed
    sequences, reusing :func:`~solana_etl_spark.operators.packing.
    pack_sequences` with one row per conversation (a conversation never
    splits across a mask boundary mid-turn; the packer accounts
    whole-conversation token totals).

Scale shape: the span computation is ONE shuffle keyed by ``conv_id``
(the window cumsum); everything else is per-row codegen. At 100 TB,
conversations are bounded (thousands of tokens), so per-key window state
is trivially small and the key count is huge — no skew, no global sort.
Token counts are tokenizer-pluggable: pass ``n_tokens`` (e.g. a real BPE
token count from vocab.apply_bpe_replace) to override the default
whitespace count, mirroring packing.pack_sequences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solana_etl_spark.operators.text import tokens

TURNS_PER_CONV = 4

ROLE_USER = "user"
ROLE_ASSISTANT = "assistant"


def conversations(documents: DataFrame, turns_per_conv: int = TURNS_PER_CONV) -> DataFrame:
    """Deterministic conversations from a flat corpus: consecutive
    ``turns_per_conv`` documents form one conversation, ordered by
    ``turn_idx``, roles alternating user-first. Pure per-row projection
    (zero shuffle); membership is a function of ``doc_id`` alone, so the
    construction is retry-safe and stable under corpus growth."""
    turn_idx = F.col("doc_id") % turns_per_conv
    return documents.select(
        (F.col("doc_id") - turn_idx).cast("long").alias("_base"),
        turn_idx.cast("long").alias("turn_idx"),
        F.when(turn_idx % 2 == 0, F.lit(ROLE_USER))
        .otherwise(F.lit(ROLE_ASSISTANT))
        .alias("role"),
        "text",
        "lang",
        "source",
    ).withColumn("conv_id", (F.col("_base") / turns_per_conv).cast("long")).drop("_base")


def _n_tokens(n_tokens: Column | None) -> Column:
    col = F.size(tokens(F.col("text"))) if n_tokens is None else n_tokens
    return col.cast("long")


def loss_mask_spans(conv: DataFrame, n_tokens: Column | None = None) -> DataFrame:
    """``(conv_id, turn_idx, span_start, span_end)`` for every assistant
    turn: the token-offset interval the loss applies to inside the
    conversation's concatenated token stream. ``span_end`` is exclusive;
    spans of one conversation are disjoint and ordered. One window cumsum
    keyed by ``conv_id`` — the only shuffle."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    with_cum = conv.select(
        "conv_id", "turn_idx", "role", _n_tokens(n_tokens).alias("n_tokens")
    ).withColumn("span_end", F.sum("n_tokens").over(w))
    return (
        with_cum.filter(F.col("role") == ROLE_ASSISTANT)
        .select(
            "conv_id",
            "turn_idx",
            (F.col("span_end") - F.col("n_tokens")).alias("span_start"),
            "span_end",
        )
    )


def sft_stats(conv: DataFrame, n_tokens: Column | None = None) -> DataFrame:
    """Per-conversation mix diagnostics: ``n_turns``, ``prompt_tokens``
    (user turns), ``completion_tokens`` (assistant turns), and
    ``mask_ratio`` = completion / total (the fraction of tokens that carry
    loss — SFT mixes are commonly tuned/filtered on it). One partial-agg
    groupBy; map-side combine makes the shuffle rows-per-conversation."""
    is_asst = F.col("role") == ROLE_ASSISTANT
    n_tok = _n_tokens(n_tokens)
    return (
        conv.select("conv_id", "role", n_tok.alias("n_tokens"))
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(~is_asst, F.col("n_tokens")).otherwise(F.lit(0))).alias(
                "prompt_tokens"
            ),
            F.sum(F.when(is_asst, F.col("n_tokens")).otherwise(F.lit(0))).alias(
                "completion_tokens"
            ),
        )
        .withColumn(
            "mask_ratio",
            F.round(
                F.col("completion_tokens")
                / (F.col("prompt_tokens") + F.col("completion_tokens")).cast("double"),
                9,
            ),
        )
    )


def prompt_dedup(conv: DataFrame) -> DataFrame:
    """Conversation-level dedup keyed on the normalized FIRST USER TURN —
    the prompt. Two conversations sharing a prompt leak one's completion
    into the other's context at training time and double-count the prompt
    in eval splits; this is the SFT analog of document exact-dedup. One
    hash aggregate over first turns only (16-byte shuffle rows via
    ``hash64``, regardless of prompt size): (prompt_hash, keeper_conv,
    n_convs), keeper = smallest conv_id (first occurrence wins)."""
    from solana_etl_spark.functions.hashing import hash64
    from solana_etl_spark.operators.dedup import normalized_text

    return (
        conv.filter(F.col("turn_idx") == 0)
        .select("conv_id", hash64(normalized_text()).alias("prompt_hash"))
        .groupBy("prompt_hash")
        .agg(
            F.min("conv_id").alias("keeper_conv"),
            F.count(F.lit(1)).alias("n_convs"),
        )
    )


def pack_with_masks(
    conv: DataFrame,
    budget: int,
    group_col: str = "lang",
    n_tokens: Column | None = None,
    shards_per_group: int = 1,
) -> DataFrame:
    """Per packed sequence, the loss-mask accounting AFTER packing:
    ``(group, [shard,] seq_id, seq_tokens, loss_tokens, loss_ratio)`` —
    how many of each fixed-budget training sequence's tokens actually
    carry loss once conversations are laid end-to-end. The number a
    fine-tuning run's effective-batch-size math needs; masks must survive
    packing, and this is the operator that proves they do.

    Construction: conversations group by their FIRST turn's ``group_col``
    (deterministic — turn 0 always exists) and are laid out in conv_id
    order. Three bounded shuffles: turn cumsum per conversation,
    conversation-offset cumsum per group, and the final (group, seq)
    aggregate. Assistant spans are shifted to absolute stream offsets and
    exploded only over the sequences they overlap — per-row work is
    O(spanned sequences), never O(stream length).

    ``shards_per_group`` > 1 is the 100 TB skew valve (same contract as
    :func:`packing.pack_sequences`): the conversation-offset cumsum
    serializes each group through one reducer, so a dominant group is the
    job's bound. Sharding hashes each conversation into one of N
    (group, shard) streams (deterministic hash64 of conv_id) and packs
    each independently — sequences become (group, shard, seq_id) and
    window state shrinks to ~group/N. Mask accounting is untouched:
    spans land in their own conversation's stream by construction."""
    n_tok = _n_tokens(n_tokens)
    w_turn = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = conv.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col(group_col).alias("_g"),
        n_tok.alias("n_tokens"),
    ).withColumn("turn_end", F.sum("n_tokens").over(w_turn))
    turns = turns.withColumn(
        "grp", F.max(F.when(F.col("turn_idx") == 0, F.col("_g"))).over(
            Window.partitionBy("conv_id")
        )
    )
    # a conversation with no turn 0 (sparse ids after upstream filtering)
    # OR whose turn-0 group value is NULL has no group; drop it explicitly
    # rather than emitting sequences under a NULL group. The oracle's
    # glang CTE applies the same two conditions (inner join on first
    # turns + `grp IS NOT NULL`), keeping the engines aligned even when
    # the group column is nullable.
    turns = turns.filter(F.col("grp").isNotNull())
    if shards_per_group > 1:
        from solana_etl_spark.functions.hashing import hash64

        turns = turns.withColumn(
            "_shard",
            F.pmod(
                hash64(F.col("conv_id").cast("string")),
                F.lit(shards_per_group),
            ).cast("int"),
        )
        out_shard = [F.col("_shard").alias("shard")]
    else:
        turns = turns.withColumn("_shard", F.lit(0))
        out_shard = []
    w_conv = Window.partitionBy("grp", "_shard").orderBy("conv_id")
    conv_tot = (
        turns.groupBy("grp", "_shard", "conv_id")
        .agg(F.sum("n_tokens").alias("conv_tokens"))
        .withColumn("conv_end", F.sum("conv_tokens").over(w_conv))
        .withColumn("conv_start", F.col("conv_end") - F.col("conv_tokens"))
    )
    spans = turns.filter(F.col("role") == ROLE_ASSISTANT).join(
        conv_tot.select("conv_id", "conv_start", "conv_end"), "conv_id"
    )
    abs_start = F.col("conv_start") + F.col("turn_end") - F.col("n_tokens")
    abs_end = F.col("conv_start") + F.col("turn_end")
    spans = spans.select(
        "grp",
        "_shard",
        abs_start.alias("s"),
        abs_end.alias("e"),
    ).filter(F.col("e") > F.col("s"))
    # explode each span over only the sequences it overlaps
    seqs = spans.select(
        "grp",
        "_shard",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / budget),
                F.floor((F.col("e") - 1) / budget),
            )
        ).alias("seq_id"),
    )
    overlap = F.least(F.col("e"), (F.col("seq_id") + 1) * budget) - F.greatest(
        F.col("s"), F.col("seq_id") * budget
    )
    loss = seqs.groupBy("grp", "_shard", "seq_id").agg(
        F.sum(overlap).alias("loss_tokens")
    )
    # every sequence the stream occupies (also those with zero loss)
    group_tot = conv_tot.groupBy("grp", "_shard").agg(
        F.max("conv_end").alias("total")
    )
    all_seqs = group_tot.filter(F.col("total") > 0).select(
        "grp",
        "_shard",
        "total",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.floor((F.col("total") - 1) / budget)
            )
        ).alias("seq_id"),
    ).select(
        "grp",
        "_shard",
        "seq_id",
        F.least(
            F.lit(budget).cast("long"),
            F.col("total") - F.col("seq_id") * budget,
        ).alias("seq_tokens"),
    )
    return (
        all_seqs.join(loss, ["grp", "_shard", "seq_id"], "left")
        .select(
            F.col("grp").alias(group_col),
            *out_shard,
            "seq_id",
            "seq_tokens",
            F.coalesce("loss_tokens", F.lit(0)).alias("loss_tokens"),
            F.round(
                F.coalesce("loss_tokens", F.lit(0))
                / F.col("seq_tokens").cast("double"),
                9,
            ).alias("loss_ratio"),
        )
    )


def pack_conversations(
    conv: DataFrame, budget: int, n_tokens: Column | None = None
) -> DataFrame:
    """Conversations → fixed token-budget packed sequences. Each
    conversation contributes its total token count as one packing unit
    (flattened turns stay contiguous so loss-mask offsets stay valid after
    adding the sequence-level offset). Reuses packing.pack_sequences:
    same accounting, same single-window shape."""
    from solana_etl_spark.operators.packing import pack_sequences

    # group by the FIRST turn's lang — the same convention as
    # pack_with_masks, so both packing entry points agree on stream
    # assignment for mixed-lang conversations; no-turn-0 convs drop
    totals = (
        conv.select(
            "conv_id", "turn_idx", "lang", _n_tokens(n_tokens).alias("n_tokens")
        )
        .groupBy("conv_id")
        .agg(
            F.max(F.when(F.col("turn_idx") == 0, F.col("lang"))).alias("lang"),
            F.sum("n_tokens").alias("conv_tokens"),
        )
        .filter(F.col("lang").isNotNull())
    )
    return pack_sequences(
        totals.withColumnRenamed("conv_id", "doc_id"),
        budget=budget,
        group_cols=("lang",),
        order_col="doc_id",
        n_tokens=F.col("conv_tokens"),
    ).withColumnRenamed("doc_id", "conv_id")
