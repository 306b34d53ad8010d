"""Real BPE tokenizer: distributed vocabulary counting, deterministic
merge-table training, broadcast-merge encoding.

The repo's token counter so far was the BPE-ish *pre-tokenizer* regex
(functions/textfns.n_bpe_tokens); a token-budgeting pipeline ultimately
needs an actual merge-table BPE. This is the standard architecture at
100 TB (it is how production BPE trainers work — training operates on the
word-FREQUENCY table, never the corpus):

  1. distributed word counts — the only corpus-scale pass: one
     explode + hash agg (partial combine map-side), output is
     vocabulary-sized;
  2. the bounded word-frequency table (loud cap, like the IVF centroid
     sample, similarity.py) trains the merge table LOCALLY — BPE training
     is inherently sequential (merge r depends on the tokenization under
     merges 1..r-1), and after step 1 it no longer touches data-scale
     input;
  3. encoding broadcasts the tiny merge list into an Arrow-batched UDF
     (per-batch word memo: each distinct word per batch is encoded once)
     — a zero-shuffle map over the corpus.

Determinism contract (one algorithm, two engines): pair counts are
positional (overlapping) sums of word frequencies; the best pair is
(count DESC, left ASC, right ASC) — pure ASCII string order; applying a
merge rewrites non-overlapping occurrences left-to-right. Applying merges
in RANK ORDER once each equals the iterative lowest-rank-first encoder:
a merge can only create pairs involving its NEW token, and any merge
using that token has a higher rank, so earlier merges never become
re-applicable (the standard replay argument). Left-to-right non-overlap
is exactly SQL REPLACE on a delimiter-wrapped token string
('|c||h||a||r|'), which is what makes the DuckDB oracle expressible as an
unrolled per-round CTE chain (the same device as the PageRank oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The trained charset; other words don't count tokens. THREE regex engines
# evaluate this predicate and their default end anchors disagree: Java's $
# (Spark rlike) matches before a trailing line terminator, Python's \Z is
# absolute end, RE2's $ (DuckDB) is end-of-text. Each engine gets the
# anchor that means ABSOLUTE end-of-text so 'abc\n' is excluded uniformly.
WORD_CHARS = "[a-z]+"
WORD_RE = f"^{WORD_CHARS}$"  # DuckDB RE2 form ($ = end of text)
WORD_RE_JAVA = f"^{WORD_CHARS}\\z"  # Spark rlike (Java: \z = absolute end)
WORD_RE_PY = f"{WORD_CHARS}\\Z"  # re.match anchor (Python: \Z = absolute end)
DEFAULT_MERGES = 50
MAX_VOCAB = 100_000


def word_frequencies(docs: DataFrame) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-scale pass. At 10^12
    docs this is a classic word-count: partial aggregation folds per-task
    counts map-side, and the exchange carries vocabulary-sized rows."""
    return (
        docs.selectExpr("explode(split(text, ' ')) AS word")
        .where(F.col("word").rlike(WORD_RE_JAVA))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _apply_merge(toks: list[str], left: str, right: str) -> list[str]:
    """Rewrite non-overlapping (left, right) adjacencies left-to-right —
    the exact semantics of REPLACE over the wrapped-token string."""
    out: list[str] = []
    i = 0
    n = len(toks)
    while i < n:
        if i + 1 < n and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def train_merges_local(
    word_freq: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Deterministic BPE training over a (word, freq) table: per round,
    count adjacent pairs positionally (weighted by freq), pick
    (count DESC, left ASC, right ASC), rewrite. Returns
    [(left, right, count)] in rank order; stops early when no pair
    remains. Pure local fold — the input is the BOUNDED vocabulary table,
    never the corpus."""
    words = [(list(w), int(f)) for w, f in word_freq]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for toks, f in words:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        words = [(_apply_merge(t, left, right), f) for t, f in words]
    return merges


def train_bpe(
    docs: DataFrame, n_merges: int = DEFAULT_MERGES, max_vocab: int = MAX_VOCAB
) -> list[tuple[str, str, int]]:
    """Distributed word counts -> local merge training. The vocabulary
    collect is bounded and LOUD: real corpora cap training vocab anyway
    (top-K by frequency); silently truncating would change the merges, so
    an over-cap vocabulary raises instead."""
    wf = word_frequencies(docs)
    # ONE corpus-scale pass (the pin rule, SURVEY §8): limit(max_vocab + 1)
    # both bounds the collect and detects an over-cap vocabulary — the
    # previous count()-then-collect() ran the corpus aggregation twice
    rows = wf.limit(max_vocab + 1).collect()
    if len(rows) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; raise the cap or "
            "pre-filter rare words (training must see a bounded, "
            "deterministic word table)"
        )
    wf_sorted = sorted((r["word"], r["freq"]) for r in rows)
    return train_merges_local(wf_sorted, n_merges)


def encode_token_counts(
    docs: DataFrame, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """(doc_id, n_bpe_tokens): the distributed encode path — merge list
    broadcast into one Arrow-batched UDF, zero shuffles. Words are encoded
    once per batch (memo), replaying merges in rank order."""
    ranked = [(left, right) for left, right, _ in merges]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        word_ok = re.compile(WORD_RE_PY)
        memo: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            got = memo.get(w)
            if got is None:
                toks = list(w)
                for left, right in ranked:
                    if len(toks) == 1:
                        break
                    toks = _apply_merge(toks, left, right)
                got = memo[w] = len(toks)
            return got

        for pdf in batches:
            # NULL text counts 0 tokens (the oracle's LEFT JOIN + COALESCE
            # path); None.split would otherwise kill the Arrow task
            n = [
                0 if t is None else
                sum(word_tokens(w) for w in t.split(" ") if word_ok.match(w))
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "n_bpe_tokens": n})

    return docs.select("doc_id", "text").mapInPandas(
        fn, schema="doc_id long, n_bpe_tokens long"
    )


def bpe_summary(docs: DataFrame, n_merges: int = DEFAULT_MERGES) -> DataFrame:
    """Driver-checkable union frame (kind, rk, tok, val):
      ('merge', rank, merged_token, weighted_pair_count)  — the merge table
      ('doc',   doc_id, '',         n_bpe_tokens)         — the encoding
    All columns inside the driver-canon-safe palette (STRING + BIGINT)."""
    spark = docs.sparkSession
    merges = train_bpe(docs, n_merges)
    mrows = [
        ("merge", r + 1, left + right, int(cnt))
        for r, (left, right, cnt) in enumerate(merges)
    ]
    mdf = spark.createDataFrame(mrows, "kind string, rk long, tok string, val long")
    ddf = encode_token_counts(docs, merges).selectExpr(
        "'doc' AS kind", "doc_id AS rk", "'' AS tok", "n_bpe_tokens AS val"
    )
    return mdf.unionByName(ddf)


def oracle_bpe_sql(n_merges: int = DEFAULT_MERGES, table: str = "documents") -> str:
    """DuckDB mirror: trains the SAME merge table and encodes the SAME
    token counts entirely in SQL — an unrolled CTE chain (one round per
    merge, like the PageRank oracle): tokenization state is the
    delimiter-wrapped string '|c||h||a||r|'; pair counting unnests the
    adjacent positions weighted by word freq; the best pair is
    (cnt DESC, l, r) LIMIT 1; application is one REPLACE. A round with no
    remaining pairs carries the state through unchanged (LEFT JOIN +
    CASE), matching the Python early-stop."""
    # every w{r}/b{r} is referenced twice (next round + the merge arm), so
    # they MUST be MATERIALIZED: DuckDB inlines plain CTEs, and a 2-ref
    # chain of 50 rounds would expand to 2^50 scans
    rounds = []
    for r in range(1, n_merges + 1):
        prev = f"w{r - 1}"
        rounds.append(f"""
p{r} AS (
  SELECT t[i] AS l, t[i + 1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT *, unnest(generate_series(1, len(t) - 1)) AS i
    FROM (SELECT freq, string_split(trim(w, '|'), '||') AS t FROM {prev})
    WHERE len(t) > 1
  )
  GROUP BY 1, 2
),
b{r} AS MATERIALIZED (SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l, r LIMIT 1),
w{r} AS MATERIALIZED (
  SELECT word, freq,
    CASE WHEN b.l IS NULL THEN w
         ELSE REPLACE(w, '|' || b.l || '||' || b.r || '|',
                      '|' || b.l || b.r || '|') END AS w
  FROM {prev} LEFT JOIN b{r} b ON TRUE
)""")
        # merge-table arm row for round r comes straight from b{r}
    merge_arm = "\nUNION ALL\n".join(
        f"SELECT 'merge' AS kind, CAST({r} AS BIGINT) AS rk, l || r AS tok, "
        f"cnt AS val FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return f"""
WITH wf AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM {table}
  ) WHERE regexp_matches(word, '{WORD_RE}') GROUP BY 1
),
w0 AS MATERIALIZED (
  SELECT word, freq, regexp_replace(word, '(.)', '|\\1|', 'g') AS w FROM wf
),
{",".join(rounds)},
tokcount AS (
  SELECT word, CAST(len(string_split(trim(w, '|'), '||')) AS BIGINT) AS n_tok
  FROM w{n_merges}
),
docwords AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM {table}
  ) WHERE regexp_matches(word, '{WORD_RE}')
)
{merge_arm}
UNION ALL
SELECT 'doc' AS kind, CAST(d.doc_id AS BIGINT) AS rk, '' AS tok,
       CAST(COALESCE(SUM(tc.n_tok), 0) AS BIGINT) AS val
FROM (SELECT DISTINCT doc_id FROM {table}) d
LEFT JOIN docwords dw ON d.doc_id = dw.doc_id
LEFT JOIN tokcount tc ON dw.word = tc.word
GROUP BY d.doc_id
"""
