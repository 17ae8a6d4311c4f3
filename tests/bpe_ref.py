"""Independent pure-Python BPE reference for ``bpe_learn``.

The engine's golden oracle freezes bpe_learn's output per committed
fixture fingerprint — which means a GENERATED corpus (the sfN step-up
fixture) had no oracle at all ("golden-skip", VERDICT r11 next #7).
This module re-derives the expected output from scratch on any corpus:
word frequencies come from DuckDB (not Spark), and the BPE loop is
plain Python — an implementation that shares no code with the engine's
distributed merge fold, so agreement is real differential evidence
(the jpeg_gif_ref.py pattern).

Semantics mirrored from cpt_database_sync_spark/operators/llm_text.py:
- words = whitespace split of trim(text), empty tokens dropped;
- BPE_MERGES rounds; each round counts adjacent symbol pairs weighted
  by word frequency over words with >= 2 symbols, picks max with the
  deterministic tie-break (count DESC, a ASC, b ASC), stops when no
  pair exists;
- merge application is LEFTMOST-GREEDY over the symbol array: a fold
  that merges s onto the accumulator tail when (tail == a and s == b).
  Note the fold semantics on a run like "aaa" with merge (a,a): after
  merging the first two, the tail is "aa" != "a", so the third "a"
  appends — exactly the engine's F.aggregate lambda.
"""

from __future__ import annotations

import duckdb

BPE_MERGES = 12  # keep in lockstep with operators/llm_text.py


def word_freqs(sf_dir: str) -> dict[str, int]:
    con = duckdb.connect()
    try:
        rows = con.execute(
            "SELECT w, COUNT(*) AS freq FROM ("
            "  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w"
            f"  FROM read_parquet('{sf_dir}/documents.parquet')"
            ") WHERE w <> '' GROUP BY w"
        ).fetchall()
    finally:
        con.close()
    return dict(rows)


def apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def bpe_learn_ref(freqs: dict[str, int], merges: int = BPE_MERGES):
    """Return {word: (freq, syms)} after ``merges`` BPE rounds."""
    vocab = {w: list(w) for w in freqs}
    for _ in range(merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), _ = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        vocab = {w: apply_merge(syms, a, b) for w, syms in vocab.items()}
    return {w: (freqs[w], syms) for w, syms in vocab.items()}


def bpe_learn_ref_rows(sf_dir: str) -> set[tuple]:
    """(w, freq, tokens, n_tokens) rows matching bpe_learn's output."""
    return {
        (w, f, " ".join(syms), len(syms))
        for w, (f, syms) in bpe_learn_ref(word_freqs(sf_dir)).items()
    }
