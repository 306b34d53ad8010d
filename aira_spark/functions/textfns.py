"""Portable SQL snippet builders: one formula, two engines.

Every training-data text/dedup operator is defined ONCE as SQL expression
text generated for either engine ('spark' | 'duckdb'), so the Spark query and
the DuckDB correctness oracle can never drift. The only engine differences
are isolated here (hex->int cast, regexp 'g' flag, split/list function names).
"""

from __future__ import annotations

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
QUERY_WORDS = ("join", "scan", "filter", "agg", "sort", "hash", "merge", "window")
DATA_WORDS = ("data", "table", "row", "column", "value", "key", "batch", "stream")


def h64(expr: str, engine: str) -> str:
    """Deterministic 60-bit hash of a string expression (md5-prefix based —
    identical numeric value in Spark and DuckDB)."""
    if engine == "spark":
        return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def words(expr: str, engine: str) -> str:
    if engine == "spark":
        return f"split({expr}, ' ')"
    return f"string_split({expr}, ' ')"


def n_tokens(expr: str, engine: str) -> str:
    if engine == "spark":
        return f"size(split({expr}, ' '))"
    return f"len(string_split({expr}, ' '))"


# BPE-ish pre-tokenizer classes (GPT-2 style, simplified to the subset where
# Java regex and RE2 agree): letter runs | digit runs | non-space symbol runs
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


def n_bpe_tokens(expr: str, engine: str) -> str:
    """Token count under the BPE-ish pre-tokenization regex — the unit an
    LLM-ingest pipeline budgets by, vs the whitespace count above."""
    if engine == "spark":
        return f"size(regexp_extract_all({expr}, '{BPE_ISH_PATTERN}', 0))"
    return f"len(regexp_extract_all({expr}, '{BPE_ISH_PATTERN}'))"


def count_matching_words(words_expr: str, vocab: tuple[str, ...], engine: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in vocab)
    if engine == "spark":
        return f"size(filter({words_expr}, w -> w IN ({inlist})))"
    return f"len(list_filter({words_expr}, w -> w IN ({inlist})))"


def count_regex_chars(expr: str, pattern: str, engine: str) -> str:
    """Number of characters matching a regex class (keep-only-then-length)."""
    if engine == "spark":
        return f"length(regexp_replace({expr}, '{pattern}', ''))"
    return f"length(regexp_replace({expr}, '{pattern}', '', 'g'))"


def lines(text: str, engine: str) -> str:
    """Line array (split on chr(10) — identical literal in both engines;
    '\\n' escapes differ between Spark SQL and DuckDB string literals)."""
    if engine == "spark":
        return f"split({text}, chr(10))"
    return f"string_split({text}, chr(10))"


def n_lines(text: str, engine: str) -> str:
    if engine == "spark":
        return f"size({lines(text, engine)})"
    return f"len({lines(text, engine)})"


def n_bullet_lines(lines_expr: str, engine: str) -> str:
    """Lines starting with a bullet marker (Gopher line-level signal)."""
    pred = "substring(l, 1, 1) IN ('-', '*', '•')"
    if engine == "spark":
        return f"size(filter({lines_expr}, l -> {pred}))"
    return f"len(list_filter({lines_expr}, l -> {pred}))"


def n_ellipsis_lines(lines_expr: str, engine: str) -> str:
    """Lines ending with '...' or the single-char ellipsis (Gopher signal)."""
    pred = "(right(l, 3) = '...' OR right(l, 1) = '…')"
    if engine == "spark":
        return f"size(filter({lines_expr}, l -> {pred}))"
    return f"len(list_filter({lines_expr}, l -> {pred}))"


def n_symbol_chars(text: str, engine: str) -> str:
    """Gopher symbol count: '#' characters plus '...' runs (each counted as
    one symbol, non-overlapping) plus single-char ellipses — exact integers."""
    hashes = f"(length({text}) - length(replace({text}, '#', '')))"
    # integer division spelled per engine ('/' yields DOUBLE in both)
    if engine == "spark":
        dots = f"((length({text}) - length(replace({text}, '...', ''))) div 3)"
    else:
        dots = f"((length({text}) - length(replace({text}, '...', ''))) // 3)"
    ell = f"(length({text}) - length(replace({text}, '…', '')))"
    return f"CAST({hashes} + {dots} + {ell} AS BIGINT)"


def total_word_chars(text: str, engine: str) -> str:
    """Sum of word lengths (chars that are not the space separator) — the
    numerator of mean word length, kept as an exact integer."""
    return f"CAST(length(replace({text}, ' ', '')) AS BIGINT)"


def quality_score(text: str, engine: str) -> str:
    """Heuristic doc quality, nominally in [0, 1] (length band + stopword
    presence - non-alpha noise) but NOT clamped: degenerate short
    symbol-heavy text can score slightly below 0 (e.g. '!!!' scores
    ~-0.29) and the +0.1 base can push a perfect doc to ~1.1 — consumers
    bucketing or normalizing must not assume the closed range.
    Deterministic, engine-identical (integer/double ops)."""
    w = words(text, engine)
    stop = count_matching_words(w, STOPWORDS, engine)
    nonalpha = count_regex_chars(text, "[a-z ]", engine)  # chars NOT lowercase/space
    return (
        f"ROUND(LEAST(1.0, CAST({n_tokens(text, engine)} AS DOUBLE) / 64.0) * 0.5 "
        f"+ LEAST(1.0, CAST({stop} AS DOUBLE) * 8.0 / CAST({n_tokens(text, engine)} AS DOUBLE)) * 0.4 "
        f"- LEAST(0.4, CAST({nonalpha} AS DOUBLE) / CAST(length({text}) AS DOUBLE)) + 0.1, 6)"
    )


def lang_guess(text: str, engine: str) -> str:
    """N-gram/stopword language heuristic: scores 'query-ish' vs 'data-ish'
    vocabulary and char classes; returns a deterministic label."""
    w = words(text, engine)
    q = count_matching_words(w, QUERY_WORDS, engine)
    d = count_matching_words(w, DATA_WORDS, engine)
    s = count_matching_words(w, STOPWORDS, engine)
    return (
        f"CASE WHEN {s} * 3 > {q} + {d} THEN 'stopwordy' "
        f"WHEN {q} > {d} THEN 'queryish' "
        f"WHEN {d} > {q} THEN 'dataish' ELSE 'balanced' END"
    )


def shingles(text: str, k: int, engine: str) -> str:
    """Word k-gram shingle strings as an array expression (inline — no
    subquery, so it composes inside higher-order functions)."""
    return shingles_from_words(words(text, engine), k, engine)


def shingles_from_words(w: str, k: int, engine: str) -> str:
    """Shingles over a precomputed word-array expression/column (avoids
    re-splitting the text per element in the Spark plan)."""
    # n words yield n - k + 1 k-grams (an earlier cut emitted n - k,
    # silently dropping the final shingle in BOTH engines — formula parity
    # masked it until a hand-count test caught the bigram case)
    if engine == "spark":
        parts = " || ' ' || ".join(f"element_at({w}, j + {i})" for i in range(1, k + 1))
        # guard: Spark's sequence(0, -1) counts DOWN ([0, -1]) instead of
        # returning empty like DuckDB's range(), so short docs must short-circuit
        return (
            f"if(size({w}) < {k}, array(), "
            f"transform(sequence(0, size({w}) - {k}), j -> {parts}))"
        )
    parts = " || ' ' || ".join(f"({w})[j + {i}]" for i in range(1, k + 1))
    return f"list_transform(range(0, greatest(len({w}) - {k} + 1, 0)), j -> {parts})"


# affine minhash family over ONE base md5 per shingle (standard a*h+b mod p
# construction): 8x fewer md5 evaluations than hashing (shingle, seed) pairs
MH_P = 9007199254740881
# a < 1024 keeps a * (h mod p) < 2^63 (no int64 overflow in either engine)
MH_A = (421, 587, 701, 811, 907, 977, 647, 523)
MH_B = (1111111121, 2222222243, 3333333373, 4444444487, 5555555557, 6666666679, 7777777783, 8888888891)


def minhash(shingle_arr: str, seed: int, engine: str) -> str:
    """min over shingles of (a_seed * (h64(s) mod p) + b_seed) mod p."""
    a, b = MH_A[seed % len(MH_A)], MH_B[seed % len(MH_B)]
    base = h64("s", engine)
    if engine == "spark":
        inner = f"pmod({a} * pmod({base}, {MH_P}) + {b}, {MH_P})"
        return f"array_min(transform({shingle_arr}, s -> {inner}))"
    inner = f"({a} * ({base} % {MH_P}) + {b}) % {MH_P}"
    return f"list_min(list_transform({shingle_arr}, s -> {inner}))"


def shingle_hashes(shingle_arr: str, engine: str) -> str:
    """h64(s) mod p per shingle, materialized ONCE — the n_hash affine
    minhashes then scan this integer array instead of re-hashing the strings
    per seed (8x less md5 work at the default n_hash=8). Values are
    identical to the unhoisted minhash() by construction."""
    base = h64("s", engine)
    if engine == "spark":
        return f"transform({shingle_arr}, s -> pmod({base}, {MH_P}))"
    return f"list_transform({shingle_arr}, s -> ({base} % {MH_P}))"


def minhash_from_hashes(hash_arr: str, seed: int, engine: str) -> str:
    """minhash() over a precomputed shingle_hashes() array."""
    a, b = MH_A[seed % len(MH_A)], MH_B[seed % len(MH_B)]
    if engine == "spark":
        return f"array_min(transform({hash_arr}, h -> pmod({a} * h + {b}, {MH_P})))"
    return f"list_min(list_transform({hash_arr}, h -> ({a} * h + {b}) % {MH_P}))"


def simhash(words_expr: str, n_bits: int, engine: str) -> str:
    """n_bits-wide SimHash: bit b set iff sum over words of sign(bit b of
    h64(word)) is positive. Generated as explicit per-bit sums (identical
    expression tree both engines).

    The word hashes are materialized ONCE into an array and every per-bit
    sum aggregates over it — without that hoist the expression re-evaluates
    h64 per (word, bit): 64x the hashing work at n_bits=64.

    h64 yields 60-bit values (15 md5 hex digits), so at n_bits=64 the top 4
    bits are constant 0 — fingerprints are effectively 60-bit, which only
    shaves band selectivity (recall stays exact via the popcount verify)."""
    if engine == "spark":
        hashes = f"transform({words_expr}, w -> {h64('w', engine)})"
        # shiftright(): the infix `>>` fails to parse inside a nested lambda
        agg = lambda b: (
            f"aggregate(hs, 0L, (acc, h) -> acc + "
            f"CASE WHEN shiftright(h, {b}) % 2 = 1 THEN 1 ELSE -1 END)"
        )
    else:
        hashes = f"list_transform({words_expr}, w -> {h64('w', engine)})"
        agg = lambda b: (
            f"list_sum(list_transform(hs, h -> "
            f"CASE WHEN (h >> {b}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
    # bit 63's weight is the int64 sign bit: 1 << 63 overflows BIGINT as a
    # literal, so emit its two's-complement value (same bit pattern)
    weight = lambda b: str(1 << b) if b < 63 else str(-(1 << 63))
    terms = " + ".join(
        f"(CASE WHEN {agg(b)} > 0 THEN CAST({weight(b)} AS BIGINT) ELSE 0 END)"
        for b in range(n_bits)
    )
    # SQL has no `let`: a single-element array + lambda binds hs
    if engine == "spark":
        return f"transform(array({hashes}), hs -> ({terms}))[0]"
    return f"list_transform([{hashes}], hs -> ({terms}))[1]"


ROLL_B = 131
ROLL_M = 9007199254740881  # largest prime < 2^53: B * M stays inside int64


def rolling_hash(text: str, engine: str) -> str:
    """Karp-Rabin polynomial rolling hash of a string expression.

    Fold semantics are pinned to 'first char is the accumulator seed' so the
    Spark aggregate() and DuckDB list_reduce() (which has no init arg)
    compute bit-identical values.
    """
    if engine == "spark":
        chars = f"split({text}, '')"
        return (
            f"CASE WHEN length({text}) = 0 THEN CAST(0 AS BIGINT) ELSE "
            f"aggregate(slice({chars}, 2, size({chars}) - 1), "
            f"CAST(ascii(element_at({chars}, 1)) AS BIGINT), "
            f"(acc, c) -> pmod(acc * {ROLL_B} + ascii(c), {ROLL_M})) END"
        )
    chars = f"string_split({text}, '')"
    return (
        f"CASE WHEN length({text}) = 0 THEN CAST(0 AS BIGINT) ELSE "
        f"list_reduce(list_transform({chars}, c -> CAST(ascii(c) AS BIGINT)), "
        f"(acc, c) -> (acc * {ROLL_B} + c) % {ROLL_M}) END"
    )


def kgram_hashes(text: str, k: int, engine: str) -> str:
    """Rolling hash of every char k-gram (one per start position)."""
    if engine == "spark":
        gram = rolling_hash(f"substring({text}, j, {k})", engine)
        return f"transform(sequence(1, greatest(length({text}) - {k} + 1, 1)), j -> {gram})"
    gram = rolling_hash(f"substring({text}, CAST(j AS INTEGER), {k})", engine)
    return f"list_transform(range(1, greatest(length({text}) - {k} + 1, 1) + 1), j -> {gram})"


def winnow_from_grams(g: str, w: int, engine: str) -> str:
    """MOSS-style winnowing over a precomputed k-gram hash array column:
    minimum per sliding window of w hashes, distinct minima, sorted.

    Standard winnowing guarantee: any shared substring of length
    >= k + w - 1 between two documents yields at least one shared
    fingerprint, with O(len/w) stored values per document."""
    if engine == "spark":
        return (
            f"array_sort(array_distinct(transform("
            f"sequence(1, greatest(size({g}) - {w} + 1, 1)), "
            f"j -> array_min(slice({g}, j, {w})))))"
        )
    return (
        f"list_sort(list_distinct(list_transform("
        f"range(1, greatest(len({g}) - {w} + 1, 1) + 1), "
        f"j -> list_min(list_slice({g}, CAST(j AS INTEGER), CAST(j AS INTEGER) + {w} - 1)))))"
    )


def jaccard_words(a: str, b: str, engine: str) -> str:
    """Jaccard over distinct word sets (n-gram Jaccard uses shingles() input)."""
    if engine == "spark":
        # nullif: both-empty sets divide 0/0 -> NaN in Spark, and Spark
        # ranks NaN ABOVE every double, so `NaN >= threshold` passes
        # filters; DuckDB's 0/0 is NULL (dropped). NULL-on-empty-union
        # pins the one shared definition.
        return (
            f"ROUND(CAST(size(array_intersect({a}, {b})) AS DOUBLE) / "
            f"CAST(nullif(size(array_union({a}, {b})), 0) AS DOUBLE), 6)"
        )
    return (
        f"ROUND(CAST(len(list_intersect({a}, {b})) AS DOUBLE) / "
        f"CAST(len(list_distinct(list_concat({a}, {b}))) AS DOUBLE), 6)"
    )


def n_letter_words(expr: str, engine: str) -> str:
    """Count of letter-run words — the Flesch word unit (punctuation and
    digits never make a word, unlike the whitespace split)."""
    if engine == "spark":
        return f"size(regexp_extract_all(lower({expr}), '[a-z]+', 0))"
    return f"len(regexp_extract_all(lower({expr}), '[a-z]+'))"


def n_sentences(expr: str, engine: str) -> str:
    """Count of sentence-terminator runs ([.!?]+), clamped to >= 1 — the
    Flesch sentence unit ('...' is one terminator, not three)."""
    if engine == "spark":
        return f"GREATEST(size(regexp_extract_all({expr}, '[.!?]+', 0)), 1)"
    return f"GREATEST(len(regexp_extract_all({expr}, '[.!?]+')), 1)"


def n_syllables(expr: str, engine: str) -> str:
    """Vowel-group syllable estimate: total [aeiouy]+ runs plus one for
    every vowelless word (each word counts at least one syllable) —
    the standard closed-form proxy, deterministic in both engines."""
    if engine == "spark":
        return (
            f"(size(regexp_extract_all(lower({expr}), '[aeiouy]+', 0)) + "
            f"size(filter(regexp_extract_all(lower({expr}), '[a-z]+', 0), "
            f"w -> w NOT RLIKE '[aeiouy]')))"
        )
    return (
        f"(len(regexp_extract_all(lower({expr}), '[aeiouy]+')) + "
        f"len(list_filter(regexp_extract_all(lower({expr}), '[a-z]+'), "
        f"w -> NOT regexp_matches(w, '[aeiouy]'))))"
    )
