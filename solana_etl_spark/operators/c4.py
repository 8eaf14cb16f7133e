"""C4-style web-page cleaning (Raffel et al. 2020, the public C4 recipe):
per-line retention rules, per-page drop rules, and corpus-wide
three-sentence-span deduplication.

Line rules (applied per newline-separated line; C4 §2.2):

* keep only lines ending in a terminal punctuation mark (``. ! ? "``)
* keep only lines with at least :data:`MIN_LINE_WORDS` words
* drop any line containing the word "javascript" (case-insensitive)

Page rules:

* drop pages containing any :data:`BAD_WORDS` entry, the phrase
  "lorem ipsum", or a ``{`` (code spill)
* after line filtering, keep only pages with at least
  :data:`MIN_PAGE_LINES` surviving lines (each surviving line ends in
  terminal punctuation, so surviving lines approximate C4's "at least 3
  sentences" retention rule — documented simplification)

Span dedup (C4 §2.2 "we removed all but one of any three-sentence span
occurring more than once"): every run of :data:`SPAN_SENTS` consecutive
lines hashes to md5(joined text); the globally first occurrence — the
(page_id, position)-minimal one — is the keeper, and every line covered
by any OTHER occurrence is removed from its page.

Scale shape: the line/page rules are bare per-row array expressions
(zero shuffle — they fuse into the scan). Span dedup shuffles only
32-byte (hash, page, pos) rows: one hash-keyed aggregate picks keepers,
one join back tags non-keeper occurrences, one per-page aggregate
collects dropped line indexes — all linear in corpus size, never
pairwise. The reference for the span trick is the same
gaps-free hash-grouping used by ``dedup.exact_duplicate_spans`` (Lee et
al. 2022) with sentences instead of token windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_LINE_WORDS = 5
MIN_PAGE_LINES = 3
SPAN_SENTS = 3
TERMINAL_RE = r'[.!?"]\s*$'
# Fixture default: a 3-entry stand-in for the public ~400-entry
# "bad words" blocklist the real C4 recipe filters against. The
# operators below accept the full list either as a sequence (fused
# into the scan as a predicate chain — right up to a few dozen
# entries) or as a blocklist DataFrame (broadcast-joined — the shape
# a production deployment feeds the vendored public list through).
BAD_WORDS = ("viagra", "casino", "jackpot")


def _lines(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), "\n"), lambda l: l != "")


def _line_kept(line: Column) -> Column:
    return (
        line.rlike(TERMINAL_RE)
        & (F.regexp_count(line, F.lit(r"\S+")) >= MIN_LINE_WORDS)
        & ~F.lower(line).contains("javascript")
    )


def page_drop_predicate(
    text_col: str = "text", bad_words: Sequence[str] = BAD_WORDS
) -> Column:
    """True for pages the page-level rules remove (bad word / lorem
    ipsum / ``{``) — a bare predicate, composable with any plan. The
    blocklist fuses into the scan as a ``contains`` chain; for lists
    past a few dozen entries feed a blocklist DataFrame to
    :func:`bad_word_page_ids` / :func:`c4_line_filter` instead."""
    lowered = F.lower(F.col(text_col))
    bad = F.lit(False)
    # entries fold to lowercase like the blocklist-DataFrame path
    # (_blocklist_words) — the two parameterizations must agree on any
    # mixed-case list
    for w in bad_words:
        bad = bad | lowered.contains(w.lower())
    return bad | lowered.contains("lorem ipsum") | F.col(text_col).contains("{")


def bad_word_page_ids(
    pages: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "page_id",
) -> DataFrame:
    """ids of pages containing ANY blocklist entry (case-insensitive
    substring — the same semantics as the predicate chain), with the
    blocklist as a first-class dimension table (one ``word`` column).

    Spark shape: a LEFT-SEMI broadcast nested-loop join — the right
    choice here because the match is substring containment, not
    equality, so there is no join key to hash on; the blocklist
    broadcast is constant-size (the public list is ~400 entries) and the
    page side streams through map-side, one pass, no shuffle. Semi-join
    semantics stop probing a page at its FIRST matching word (duplicate
    blocklist rows are harmless, so no distinct — a distinct would be
    the plan's only exchange)."""
    return pages.join(
        _blocklist_words(blocklist),
        F.lower(F.col(text_col)).contains(F.col("_w")),
        "left_semi",
    ).select(id_col)


def _blocklist_words(blocklist: DataFrame):
    return F.broadcast(
        blocklist.select(F.lower(F.col("word")).alias("_w"))
    )


def c4_line_filter(
    pages: DataFrame,
    text_col: str = "text",
    id_col: str = "page_id",
    bad_words: Sequence[str] | DataFrame = BAD_WORDS,
) -> DataFrame:
    """Apply the line + page rules. Returns surviving pages as
    (id, n_lines, n_kept, text_clean) where ``text_clean`` is the kept
    lines re-joined — one projection + one filter, zero shuffle at the
    default blocklist. ``bad_words`` may be a sequence (predicate chain
    fused into the scan) or a blocklist DataFrame with a ``word`` column
    (broadcast semi-join via :func:`bad_word_page_ids` — the production
    shape for the public ~400-entry list)."""
    lines = _lines(text_col)
    kept = F.filter(lines, _line_kept)
    if isinstance(bad_words, DataFrame):
        # ANTI form of bad_word_page_ids, fused: one broadcast NLJ drops
        # matching pages in the same pass — no id re-join, no shuffle
        survivors = pages.join(
            _blocklist_words(bad_words),
            F.lower(F.col(text_col)).contains(F.col("_w")),
            "left_anti",
        ).filter(~page_drop_predicate(text_col, bad_words=()))
    else:
        survivors = pages.filter(
            ~page_drop_predicate(text_col, bad_words=bad_words)
        )
    return (
        survivors.select(
            id_col,
            F.size(lines).cast("long").alias("n_lines"),
            F.size(kept).cast("long").alias("n_kept"),
            F.array_join(kept, "\n").alias("text_clean"),
        )
        .filter(F.col("n_kept") >= MIN_PAGE_LINES)
    )


def _span_occurrences(
    pages: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, span_hash) for every SPAN_SENTS-line window."""
    spans = F.expr(
        f"""
        transform(
            sequence(0, size(_ls) - {SPAN_SENTS}),
            i -> struct(
                i AS pos,
                md5(concat_ws('\\n', slice(_ls, i + 1, {SPAN_SENTS}))) AS h
            )
        )
        """
    )
    return (
        pages.select(id_col, _lines(text_col).alias("_ls"))
        .filter(F.size("_ls") >= SPAN_SENTS)
        .select(id_col, F.explode(spans).alias("_s"))
        .select(id_col, F.col("_s.pos").alias("pos"), F.col("_s.h").alias("h"))
    )


def c4_span_dedup(
    pages: DataFrame, text_col: str = "text", id_col: str = "page_id"
) -> DataFrame:
    """Corpus-wide three-sentence-span dedup. Returns every input page as
    (id, n_lines, n_dropped_lines, text_dedup) — pages containing no
    duplicated span pass through with their text unchanged (modulo the
    newline re-join of the same lines, byte-identical for
    newline-separated input)."""
    occ = _span_occurrences(pages, text_col, id_col)
    keepers = occ.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
        F.count(F.lit(1)).alias("_n"),
    )
    dup_occ = occ.join(keepers.filter(F.col("_n") > 1), "h").filter(
        (F.col(id_col) != F.col(f"_first.{id_col}"))
        | (F.col("pos") != F.col("_first.pos"))
    )
    return _without_covered_lines(pages, dup_occ, text_col, id_col)


def _without_covered_lines(
    pages: DataFrame, dup_occ: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, n_lines, n_dropped_lines, text_dedup): drop from each page
    every line covered by an (id, pos) occurrence in ``dup_occ`` — the
    shared rebuild tail of in-corpus and vs-index span dedup."""
    dup_lines = (
        dup_occ.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (SPAN_SENTS - 1))
            ).alias("idx"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.collect_set("idx").alias("_drop"))
    )
    lines = _lines(text_col)
    return (
        pages.join(dup_lines, id_col, "left")
        .select(
            id_col,
            F.size(lines).cast("long").alias("n_lines"),
            # explicit isNull guard: size(NULL) is -1 under the session's
            # legacy sizeOfNull conf, so coalesce(size(...)) never fires
            F.when(F.col("_drop").isNull(), F.lit(0))
            .otherwise(F.size("_drop"))
            .cast("long")
            .alias("n_dropped_lines"),
            F.array_join(
                F.filter(
                    lines,
                    lambda l, i: ~F.coalesce(
                        F.array_contains("_drop", i), F.lit(False)
                    ),
                ),
                "\n",
            ).alias("text_dedup"),
        )
    )


def span_hashes(
    pages: DataFrame, text_col: str = "text", id_col: str = "page_id"
) -> DataFrame:
    """Distinct md5 hashes (column ``h``) of every SPAN_SENTS-line window
    in the corpus — the rows a streaming deployment persists as its
    cross-batch span index (streaming/web_stream.py): a span seen in any
    earlier batch makes every later occurrence a non-first duplicate."""
    return _span_occurrences(pages, text_col, id_col).select("h").distinct()


def c4_span_dedup_with_index(
    pages: DataFrame,
    span_index: DataFrame,
    text_col: str = "text",
    id_col: str = "page_id",
) -> DataFrame:
    """In-batch span dedup AND cross-batch index strip in ONE pass over
    the ORIGINAL text: occurrences are computed once, the dropped set is
    (in-batch non-first occurrences) ∪ (occurrences whose hash is in
    ``span_index``), and the text is rebuilt once.

    This is NOT the same as ``strip_spans_in_index(c4_span_dedup(p))``:
    chaining them recomputes windows on the REBUILT post-in-batch text,
    where line removal can manufacture windows that never existed in the
    original page (wrongly stripped if indexed) and destroy windows that
    did (missed strips) — the batch chain computes every window on the
    original text, so the streaming arm must too
    (streaming/web_stream.py's stream==batch contract)."""
    occ = _span_occurrences(pages, text_col, id_col)
    keepers = occ.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
        F.count(F.lit(1)).alias("_n"),
    )
    in_batch = (
        occ.join(keepers.filter(F.col("_n") > 1), "h")
        .filter(
            (F.col(id_col) != F.col(f"_first.{id_col}"))
            | (F.col("pos") != F.col("_first.pos"))
        )
        .select(id_col, "pos")
    )
    indexed = occ.join(span_index.select("h"), "h").select(id_col, "pos")
    return _without_covered_lines(
        pages, in_batch.unionByName(indexed), text_col, id_col
    )


def strip_spans_in_index(
    pages: DataFrame,
    span_index: DataFrame,
    text_col: str = "text",
    id_col: str = "page_id",
) -> DataFrame:
    """Cross-batch arm of span dedup: remove every line covered by a
    window whose hash appears in ``span_index`` (column ``h`` — spans
    seen in EARLIER batches, so every current occurrence is a non-first
    duplicate). Same output shape as :func:`c4_span_dedup`; an empty
    index passes pages through unchanged. One hash-keyed join — linear,
    never pairwise."""
    occ = _span_occurrences(pages, text_col, id_col)
    return _without_covered_lines(
        pages, occ.join(span_index.select("h"), "h"), text_col, id_col
    )
