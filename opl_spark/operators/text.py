"""Text-analysis operators over a document corpus: tokenization,
language ID, quality scoring, fingerprinting.

All pure column expressions (``pyspark.sql.functions`` only) — they
run inside whole-stage codegen and scale linearly with no shuffle; a
100 TB corpus processes as a single map stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish tokenizer regex: letter runs, digit runs, or single
#: non-space symbols — the standard pre-tokenization split.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_col(text: Column) -> Column:
    """Number of BPE-ish tokens (regex pre-tokenization count)."""
    return F.array_size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)).cast("long")


def whitespace_token_count_col(text: Column) -> Column:
    """Plain whitespace token count."""
    return F.array_size(F.split(F.trim(text), r"\s+")).cast("long")


#: Tiny per-language marker lexicons for the n-gram/stopword heuristic
#: language identifier. Real deployments plug in fastText/CLD3 via a
#: Pandas UDF; the heuristic itself is the built-in-function scale path.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "it": ("il", "la", "di", "che", "e"),
}


def _marker_score(words: Column, markers: tuple[str, ...]) -> Column:
    # one filter pass per language (lambda compares its element arg
    # against literals only — no captured array expressions, so the
    # tokenization is evaluated once per row, not once per element)
    return F.array_size(F.filter(words, lambda w: w.isin(*markers)))


def lang_id_col(text: Column, default: str = "und") -> Column:
    """Heuristic language ID: argmax of per-language stopword-marker
    hits over the whitespace tokens; ``und`` (undetermined) when no
    marker hits at all.  Deterministic, shuffle-free."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    scored = [
        F.struct(_marker_score(words, m).alias("score"), F.lit(lang).alias("lang"))
        for lang, m in sorted(LANG_MARKERS.items(), reverse=True)
    ]
    # array_max over (score, lang) structs: ties break toward the
    # lexicographically LAST language tag; reverse-sorted build order
    # makes that stable and documented.
    best = F.array_max(F.array(*scored))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit(default))


def quality_columns(text: Column) -> dict[str, Column]:
    """Document quality heuristics: length, word stats, punctuation
    and stopword ratios — the standard pre-training corpus filters.

    Ratios are rounded(6) over exact integer counts so they are
    bit-identical across engines.
    """
    n_chars = F.length(text).cast("long")
    words = F.split(F.trim(text), r"\s+")
    n_words = F.array_size(words).cast("long")
    n_punct = F.array_size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)).cast("long")
    stop_hits = _marker_score(F.split(F.lower(F.trim(text)), r"\s+"), LANG_MARKERS["en"])
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": F.round(
            (n_chars - (n_words - F.lit(1))).cast("double") / n_words, 6
        ),
        "punct_ratio": F.round(n_punct.cast("double") / n_chars, 6),
        "stopword_ratio": F.round(stop_hits.cast("double") / n_words, 6),
    }


def fingerprint_col(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct whitespace tokens — the classic "fingerprint clustering"
    key (two docs with permuted/duplicated words collide)."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.trim(text), r"\s+"))), " ")
    )
