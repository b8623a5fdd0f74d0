"""Text analysis for document curation: token counting, quality
scoring, language ID, document fingerprinting.

All the scoring paths are pure Column expressions (whole-stage
codegen); the only Python is the char-n-gram language-ID profile UDF,
which is Arrow-batched (`pandas_udf`) and optional — the stopword
variant is JVM-side and SQL-reproducible.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from .dedup import tokens, simhash

__all__ = [
    "token_count", "text_stats", "quality_score", "lang_id_stopword",
    "lang_id_ngram", "doc_fingerprint", "STOPWORDS", "LANG_MARKERS",
]

# A small English stopword core — enough signal for ratio features.
STOPWORDS: List[str] = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "was",
]

# Marker words per language for the JVM-side heuristic language ID.
LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "que", "es"],
}

# A BPE-ish word/number/punctuation-run tokenizer: the shape GPT-style
# pre-tokenizers use (letter runs, digit runs, single punctuation).
_BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token count: ``whitespace`` (split on \\s+) or ``bpe`` (letter
    runs / digit runs / punctuation marks — a regex proxy for BPE
    pre-tokenization)."""
    if mode == "whitespace":
        return F.size(tokens(text))
    if mode == "bpe":
        return F.size(F.regexp_extract_all(text, F.lit(_BPE_RE), F.lit(0)))
    raise ValueError(f"unknown token mode {mode!r}")


def _count_in(toks: Column, words: Sequence[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def text_stats(text: Column, round_to: int = 6) -> Dict[str, Column]:
    """Quality features per document: length, word count, mean word
    length, stopword ratio, alpha ratio, punctuation density. Returned
    as a dict of named Columns so callers pick what they keep."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    stop = _count_in(toks, STOPWORDS)
    safe_tok = F.greatest(n_tok, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars.cast("bigint"),
        "word_count": n_tok.cast("bigint"),
        "avg_word_len": F.round(
            F.aggregate(toks, F.lit(0.0),
                        lambda acc, t: acc + F.length(t)) / safe_tok,
            round_to),
        "stopword_ratio": F.round(stop / safe_tok, round_to),
        "alpha_ratio": F.round(alpha / safe_chars, round_to),
        "punct_ratio": F.round(punct / safe_chars, round_to),
    }


def quality_score(text: Column, round_to: int = 6) -> Column:
    """Composite quality in [0,1]: Gopher-rule-flavored — rewards
    stopword presence, alphabetic content, sane word lengths; penalizes
    punctuation soup. Deterministic arithmetic only."""
    s = text_stats(text, round_to=9)
    wl = s["avg_word_len"]
    wl_ok = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    score = (
        F.least(s["stopword_ratio"] * 4, F.lit(1.0)) * 0.3
        + s["alpha_ratio"] * 0.4
        + (1 - F.least(s["punct_ratio"] * 5, F.lit(1.0))) * 0.2
        + wl_ok * 0.1)
    return F.round(score, round_to)


def lang_id_stopword(text: Column,
                     markers: Optional[Mapping[str, Sequence[str]]] = None
                     ) -> Column:
    """JVM-side heuristic language ID: argmax of marker-word hits with
    deterministic tie-break (lexicographic language code); 'und' when
    nothing matches."""
    markers = markers or LANG_MARKERS
    toks = tokens(text)
    scored = [(lang, _count_in(toks, words))
              for lang, words in sorted(markers.items())]
    # ascending scan with strict > keeps the lexicographically-first
    # language on ties — same result as any engine's argmax-with-tiebreak
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, n in scored:
        take = n > best_n
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, n).otherwise(best_n)
    return best


# Tiny char-trigram profiles (top trigrams per language). Real systems
# load fastText/CLD3 models; the Spark plumbing (Arrow-batched UDF over
# a string column) is identical.
_NGRAM_PROFILES: Dict[str, List[str]] = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ion",
           " to"],
    "de": ["er ", "en ", "ch ", "der", " de", "die", "ie ", "ein", "sch",
           "und"],
    "fr": ["es ", " de", "de ", "le ", "ent", " le", "la ", " la", "tio",
           "ne "],
    "es": [" de", "de ", "os ", " la", "la ", "el ", " el", "que", " qu",
           "as "],
}


def lang_id_ngram(text_col: str = "text",
                  out_col: str = "lang_pred") -> Column:
    """Char-trigram profile language ID as an Arrow-batched pandas UDF
    (the 'model inference' shape: string series in, label series out).
    Vectorized over the batch; no per-row Python function calls in the
    driver plan."""
    profiles = {lang: set(g) for lang, g in _NGRAM_PROFILES.items()}
    langs = sorted(profiles)

    @pandas_udf("string")
    def _lid(s: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return "und"
            t = " " + t.lower() + " "
            grams = {t[i:i + 3] for i in range(len(t) - 2)}
            best, best_n = "und", 0
            for lang in langs:
                n = len(grams & profiles[lang])
                if n > best_n:
                    best, best_n = lang, n
            return best
        return s.map(one)

    return _lid(F.col(text_col)).alias(out_col)


def doc_fingerprint(text: Column, algo: str = "sha256") -> Column:
    """Stable content fingerprint of the *normalized* token stream
    (case/whitespace-insensitive), so cosmetic edits collapse:
    ``sha256``/``md5`` hex of the joined tokens, or ``simhash`` for a
    similarity-preserving 60-bit integer."""
    norm = F.array_join(tokens(text), " ")
    if algo == "sha256":
        return F.sha2(norm, 256)
    if algo == "md5":
        return F.md5(norm)
    if algo == "simhash":
        return simhash(text)
    raise ValueError(f"unknown fingerprint algo {algo!r}")
