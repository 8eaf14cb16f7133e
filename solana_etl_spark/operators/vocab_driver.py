"""Driver-side classic BPE / WordPiece training over the bounded
(word, freq) table — the hybrid fast path of the distributed trainers.

Why this exists: the distributed merge loop (operators/vocab.py,
operators/wordpiece.py) is exact but pays one or two Spark jobs PER
MERGE ROUND, and the provably-classic-equal batching policy realizes
only ~1.5 merges/round on Zipf text (measured, BENCH_LOCAL r7
``vocab_batched``) — a production 32k-merge vocabulary would be hours
of scheduler overhead. But the table the rounds iterate on is the
(word, freq) aggregate, which is Zipf-BOUNDED: ~10^6-10^8 rows
regardless of corpus size — the same bounded-vocab argument
operators/lm.py and operators/unigram.py already rely on. This is
exactly how SentencePiece and the HF tokenizer trainers work: one
distributed pass reduces the corpus to word counts, the greedy merge
loop runs in one process over that table.

So the hybrid: ONE corpus scan builds the word table distributed; if it
fits under a counted cap it is collected and classic greedy training
runs here with an incremental pair index + lazy max-heap (each merge
touches only the words containing the pair — the textbook fast BPE
trainer); past the cap the caller falls back to the distributed round
loop. The learned artifact is BIT-EQUAL to the classic distributed mode
by construction — same counts, same (count desc, pair lexical) /
(score desc, pair lexical) tie-breaks (Python code-point string order ==
Spark/DuckDB binary UTF-8 order; UTF-8 preserves code-point order) —
and is pinned by the property tests in tests/test_vocab_driver.py.

The reference has no tokenizer surface; charter LLM-pipeline machinery
(SURVEY §2.11 text-analysis family).
"""

from __future__ import annotations

import heapq
from collections import Counter, defaultdict
from typing import Iterable

EOW = "</w>"
CONT = "##"

# Cap on collected (word, freq) rows for the driver path — the
# train_cap / BROADCAST_CANDIDATE_CAP discipline: count first (the
# collect is LIMIT cap+1, so an over-cap table never materializes on
# the driver), fall back to the distributed rounds past it. Measured
# driver-index footprint (tracemalloc over a Zipf-shaped 50k-word
# table, tests/test_vocab_driver.py memory-budget test): ~771 B/word
# BPE, ~1053 B/word WordPiece → ~0.7-1.0 GiB at this cap, well inside
# the 16g driver session.get_spark provisions.
DRIVER_WORD_TABLE_CAP = 1_000_000


def _greedy_merge(syms: list[str], a: str, b: str, merged: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) —
    identical to operators/vocab.py merge_pair_expr's fold."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_merges_from_word_freqs(
    word_freqs: Iterable[tuple[str, int]],
    n_merges: int,
    append_eow: bool = True,
) -> list[tuple[str, str]]:
    """Classic BPE over a collected (word, freq) table: argmax pair by
    (count desc, a, b) each round, greedy-left apply. Incremental: a
    pair → containing-words index confines each round's recount to the
    words the merge touches, and a lazy heap keeps the argmax O(log P).
    An entry with each pair's CURRENT count is always present (every
    count change pushes a fresh entry), so stale pops are skipped by a
    count check without re-pushing."""
    words: list[list] = []  # [symbols, freq]
    for w, f in word_freqs:
        syms = list(w)
        if append_eow:
            syms.append(EOW)
        words.append([syms, f])

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (syms, f) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            pair_words[p].add(idx)
    heap = [(-c, a, b) for (a, b), c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, a, b = heapq.heappop(heap)
        cur = pair_counts.get((a, b), 0)
        if cur <= 0 or -negc != cur:
            continue  # stale entry; a current one is elsewhere in the heap
        merges.append((a, b))
        merged = a + b
        for idx in sorted(pair_words.get((a, b), ())):
            syms, f = words[idx]
            old = Counter(zip(syms, syms[1:]))
            new_syms = _greedy_merge(syms, a, b, merged)
            new = Counter(zip(new_syms, new_syms[1:]))
            words[idx][0] = new_syms
            for p in old.keys() | new.keys():
                d = new[p] - old[p]
                if d:
                    pair_counts[p] += d * f
                    heapq.heappush(heap, (-pair_counts[p], p[0], p[1]))
                if new[p]:
                    pair_words[p].add(idx)
                else:
                    pair_words[p].discard(idx)
        # fully consumed (greedy removed every occurrence in every
        # containing word), unless a == merged-prefix chains — the
        # per-word deltas above already left the true residual count
        if pair_counts.get((a, b), 0) <= 0:
            pair_counts.pop((a, b), None)
            pair_words.pop((a, b), None)
    return merges


def _wp_content_len(sym: str) -> int:
    return len(sym) - len(CONT) if sym.startswith(CONT) else len(sym)


def wordpiece_vocab_from_word_freqs(
    word_freqs: Iterable[tuple[str, int]],
    n_merges: int,
    max_piece_len: int = 12,
) -> list[str]:
    """Classic WordPiece over a collected (word, freq) table: merge the
    pair maximizing count(ab) / (count(a)·count(b)) (IEEE-double ratio of
    exact integer counts — the same expression the distributed trainer
    and its DuckDB-side mirrors evaluate), ties (a, b) lexical; pairs
    whose ##-stripped merged content would exceed ``max_piece_len`` are
    not candidates (they would be encoder-unreachable — see
    operators/wordpiece.py:train_wordpiece_vocab). Returns alphabet +
    merged pieces in merge order, exactly like the distributed mode.

    Heap staleness: a merge changes the counts of symbols a, b, and the
    merged token only, so the scores of exactly the pairs touching those
    symbols move — each gets a fresh entry pushed; pops verify the full
    (cnt, ca, cb) triple against current state."""
    words: list[list] = []
    for w, f in word_freqs:
        syms = [w[0]] + [CONT + c for c in w[1:]] if w else []
        if syms:
            words.append([syms, f])

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    sym_counts: dict[str, int] = defaultdict(int)
    sym_pairs: dict[str, set[tuple[str, str]]] = defaultdict(set)
    for idx, (syms, f) in enumerate(words):
        for s in syms:
            sym_counts[s] += f
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            pair_words[p].add(idx)
            sym_pairs[p[0]].add(p)
            sym_pairs[p[1]].add(p)

    alphabet = sorted(sym_counts)

    def entry(p: tuple[str, str]):
        c = pair_counts[p]
        ca, cb = sym_counts[p[0]], sym_counts[p[1]]
        return (-(c / (ca * cb)), p[0], p[1], c, ca, cb)

    heap = [
        entry(p)
        for p in pair_counts
        if _wp_content_len(p[0]) + _wp_content_len(p[1]) <= max_piece_len
    ]
    heapq.heapify(heap)

    merges: list[str] = []
    while len(merges) < n_merges and heap:
        _, a, b, c, ca, cb = heapq.heappop(heap)
        p = (a, b)
        if (
            pair_counts.get(p, 0) != c
            or c <= 0
            or sym_counts.get(a, 0) != ca
            or sym_counts.get(b, 0) != cb
        ):
            continue
        merged = a + (b[len(CONT):] if b.startswith(CONT) else b)
        merges.append(merged)
        touched_pairs: set[tuple[str, str]] = set()
        for idx in sorted(pair_words.get(p, ())):
            syms, f = words[idx]
            old_p = Counter(zip(syms, syms[1:]))
            old_s = Counter(syms)
            new_syms = _greedy_merge(syms, a, b, merged)
            new_p = Counter(zip(new_syms, new_syms[1:]))
            new_s = Counter(new_syms)
            words[idx][0] = new_syms
            for q in old_p.keys() | new_p.keys():
                d = new_p[q] - old_p[q]
                if d:
                    pair_counts[q] += d * f
                    touched_pairs.add(q)
                if new_p[q]:
                    pair_words[q].add(idx)
                    sym_pairs[q[0]].add(q)
                    sym_pairs[q[1]].add(q)
                else:
                    pair_words[q].discard(idx)
            for s in old_s.keys() | new_s.keys():
                d = new_s[s] - old_s[s]
                if d:
                    sym_counts[s] += d * f
        # scores moved for every pair touching a changed-count symbol
        # (a, b, merged) plus every pair whose own count changed
        for s in (a, b, merged):
            touched_pairs |= sym_pairs.get(s, set())
        for q in touched_pairs:
            if pair_counts.get(q, 0) <= 0:
                pair_counts.pop(q, None)
                pair_words.pop(q, None)
                # prune the per-symbol reverse index too: a dead pair
                # left in sym_pairs would be re-pushed by every later
                # merge touching its symbols (skipped on pop, but heap
                # and set growth would track all-pairs-ever, not live
                # pairs)
                for s in (q[0], q[1]):
                    ps = sym_pairs.get(s)
                    if ps is not None:
                        ps.discard(q)
                        if not ps:
                            sym_pairs.pop(s, None)
                continue
            if (
                _wp_content_len(q[0]) + _wp_content_len(q[1])
                <= max_piece_len
            ):
                heapq.heappush(heap, entry(q))
    return alphabet + merges
