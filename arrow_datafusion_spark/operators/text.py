"""Text-analysis operators for training-data pipelines: tokenization,
language-ID, quality scoring, document fingerprinting.

Everything is built-in Column expressions (regex + array folds) — per-row,
shuffle-free, whole-stage-codegen'd; at 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "ws_tokens",
    "bpe_ish_tokens",
    "STOPWORDS",
    "lang_scores",
    "lang_id",
    "quality_score",
    "rolling_hash",
    "min_ngram_fingerprint",
]


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(text, r"\s+")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization: letter runs, digit runs, and single
    punctuation marks (the GPT-2 pre-tokenizer's coarse shape)."""
    return F.regexp_extract_all(
        text, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
    )


# Tiny per-language stopword lists (public, common knowledge) — enough for an
# n-gram/stopword heuristic language ID over the fixture corpus.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "de", "las", "y"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}


def lang_scores(tokens: Column) -> list[Column]:
    """Stopword-hit count per language (fixed language order)."""
    # closure factory, not a default-arg lambda: PySpark derives HOF arity
    # from the python lambda's full parameter list
    def hits(words: tuple[str, ...]):
        return lambda t: t.isin(*words)

    return [F.size(F.filter(tokens, hits(words))) for words in STOPWORDS.values()]


def lang_id(tokens: Column) -> Column:
    """argmax language by stopword hits; first-in-order wins ties (exact
    integer comparison — deterministic on any engine)."""
    scores = F.array(*lang_scores(tokens))
    langs = F.array(*[F.lit(code) for code in STOPWORDS])
    return F.element_at(langs, F.array_position(scores, F.array_max(scores)).cast("int"))


def quality_score(text: Column) -> Column:
    """Document quality heuristic in [0,1]: length band + alpha ratio +
    stopword presence — the standard cheap pre-filter shape. Deterministic
    rational arithmetic, rounded to 6dp."""
    n = F.char_length(text)
    toks = ws_tokens(text)
    n_tok = F.size(toks)
    alpha = F.char_length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    alpha_ratio = alpha / F.greatest(n, F.lit(1))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to")))
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    len_band = F.when((n >= 100) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        0.4 * len_band + 0.4 * alpha_ratio + 0.2 * F.least(stop_ratio * 5, F.lit(1.0)),
        6,
    )


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over characters: fold of acc*31 + ascii(ch)
    mod 1e9+7. Exact int64 arithmetic (acc < 1e9+7, so acc*31+255 < 2^63)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.greatest(F.char_length(text), F.lit(1))),
        lambda i: F.ascii(F.substr(text, i, F.lit(1))),
    )
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + c) % 1000000007,
    )


def min_ngram_fingerprint(tokens: Column, n: int = 3) -> Column:
    """Winnowing-lite document fingerprint: min md5 over word n-grams —
    robust to local edits, exact-joinable for near-dup clustering."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(tokens, (i + j).cast("int")) for j in range(n)]
            )
        ),
    )
    return F.array_min(grams)
