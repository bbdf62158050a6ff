"""Text-analysis kernels for the training-data-pipeline surface.

All JVM-native column expressions (no Python UDFs): language-ID
stopword scoring, quality features, token/shingle extraction, document
fingerprinting. Each has an exact ANSI-SQL twin used as its DuckDB
oracle (see plans/queries.py), so the definitions here are deliberately
closed-form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization contract shared with the oracles: lowercase, split on
# runs of non-alphanumerics, drop empties. Keep this in sync with
# _SQL_TOKENS in plans/queries.py.
TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + ASCII so the SQL twin is identical.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "et"),
    "zh": ("de5", "le5", "shi4", "bu4", "wo3"),
}


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, strip
    non-alphanumerics to single spaces, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), TOKEN_SPLIT_RE, " "))


def tokens(col: Column | str) -> Column:
    """array<string> of normalized tokens."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# BPE-ish pretokenizer: letter runs, single digits, single punctuation
# marks — the GPT-2 pretokenize shape reduced to an RE2/Java-portable
# class regex (no \p, no lookarounds, so the DuckDB oracle runs the
# SAME pattern).
BPE_PIECE_RE = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def bpe_pieces(col: Column | str) -> Column:
    """array<string> of BPE-style pretokenizer pieces of lower(text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_PIECE_RE), 0)


def bpe_token_estimate(col: Column | str) -> Column:
    """Estimated BPE token count without a vocab: each digit or
    punctuation piece is one token; a letter run of length n is
    ceil(n/4) tokens (~4 chars/token, the standard English BPE rate).
    Pure column expression (one regex pass + one integer fold) — the
    cheap pre-tokenizer-level budget signal used for packing/pricing
    before a real tokenizer runs."""
    return F.aggregate(
        bpe_pieces(col),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(
            F.substring(p, 1, 1).between("a", "z"),
            F.floor((F.length(p) + 3) / 4).cast("long"),
        ).otherwise(F.lit(1).cast("long")),
    )


def shingles(col: Column | str, n: int = 3, toks: Column | None = None) -> Column:
    """Word n-gram shingles as array<string>; empty array when the
    document has fewer than n tokens.

    Built by zip_with over n shifted slices of the token array (n big
    array ops + elementwise concat) rather than per-position
    slice(t, i, n) calls -- the latter allocates a sub-array per
    position and measured 4.4x slower at sf0.1 (3.8s vs 0.86s warm).
    Same output, pure column expression either way.

    The token array is referenced ~2n+2 times here, and this
    expression lives in an interpreted (HOF, non-codegen) Project:
    pass `toks` as a PRE-MATERIALIZED column from its own projection
    so those references are attribute reads, not 2n+2 re-evaluations
    of regexp_replace+split (CollapseProject keeps the staging
    projection because inlining would duplicate a non-cheap expr).
    """
    t = toks if toks is not None else tokens(col)
    m = F.size(t) - (n - 1)
    parts = [F.slice(t, i + 1, m) for i in range(n)]
    zipped = parts[0]
    for p in parts[1:]:
        zipped = F.zip_with(zipped, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(F.size(t) >= n, zipped).otherwise(
        F.array().cast("array<string>")
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (The reference's analogous content-addressing: md5 of joined
    geometry coords, building-inspector.js:207-209.)"""
    return F.md5(normalize_text(col))


def _u32_of(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def winnow_fingerprints(
    col: Column | str, k: int = 3, w: int = 4, hashes: Column | None = None
) -> Column:
    """Winnowing fingerprint sketch (Schleimer/Wilkerson/Aiken, MOSS):
    hash every word k-gram to a u32, slide a window of w consecutive
    hashes, keep each window's MINIMUM, distinct the kept set. The
    rolling-hash document fingerprint: guarantees any shared substring
    of >= k+w-1 tokens contributes at least one common fingerprint,
    while storing ~2/(w+1) of the hashes.

    Pure column expressions — the w window minima come from w SHIFTED
    SLICES folded with elementwise least() (the same shape that made
    shingling 4.4x faster than per-position slice(); see
    shingles()).

    `h` below is referenced w+2 times; inline that's w+2 interpreted
    re-evaluations of the whole shingle+md5 pipeline (HOFs skip
    codegen subexpression elimination — materialize-once lesson).
    Pass `hashes` as a PRE-MATERIALIZED column
    (df.withColumn("__h", transform(shingles(c,k), u32_of))) so the
    references are attribute reads; measured 6x warm at sf0.1."""
    h = hashes if hashes is not None else F.transform(shingles(col, k), _u32_of)
    m = F.size(h) - (w - 1)
    parts = [F.slice(h, j + 1, m) for j in range(w)]
    mins = parts[0]
    for p in parts[1:]:
        mins = F.zip_with(mins, p, lambda a, b: F.least(a, b))
    return F.when(F.size(h) < w, F.array_distinct(h)).otherwise(
        F.array_distinct(mins)
    )


def lang_scores(col: Column | str, toks: Column | None = None) -> dict[str, Column]:
    """Stopword-hit count per language over the token array. Pass a
    pre-materialized token column via `toks` when computing several
    features over the same text (avoids re-deriving tokenize per
    language -- the CollapseProject duplication trap)."""
    t = toks if toks is not None else tokens(col)
    out: dict[str, Column] = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    return out


def lang_id(col: Column | str, toks: Column | None = None) -> Column:
    """argmax over lang_scores with deterministic tie-break on language
    code ('und' when every score is 0): pick min over (-score, lang)
    structs -- same as the SQL oracle's alphabetical >= CASE chain."""
    scores = lang_scores(col, toks)
    inv = F.array(
        *[
            F.struct((-s).alias("neg_score"), F.lit(lang).alias("lang"))
            for lang, s in sorted(scores.items())
        ]
    )
    best = F.array_min(inv)
    all_zero = F.array_max(F.array(*[s for _, s in sorted(scores.items())])) == 0
    return F.when(all_zero, F.lit("und")).otherwise(best.getField("lang"))


def quality_features(col: Column | str, toks: Column | None = None) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features for quality
    scoring. All closed-form so the SQL oracle is exact. Pass `toks`
    (pre-materialized token column) when emitting several features in
    one projection."""
    c = F.col(col) if isinstance(col, str) else col
    t = toks if toks is not None else tokens(col)
    n_tok = F.size(t)
    n_chars = F.length(c)
    en = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(en, x)))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    # ratios stay UNROUNDED: division of identical ints yields
    # bit-identical doubles in Spark and DuckDB, while round() itself is
    # not engine-portable at half-boundaries (Java HALF_UP on shortest
    # decimal repr vs C round on the binary value).
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": F.length(F.concat_ws("", t)).cast("double") / n_tok,
        "punct_ratio": n_punct.cast("double") / n_chars,
        "stopword_ratio": n_stop.cast("double") / n_tok,
    }
