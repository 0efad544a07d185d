"""Text analyzers as deterministic tokenizers — pure Python + Spark columns.

The reference's physical schema attaches ElasticSearch analyzers to fields
(data_catalog/configuration_const.py:21-84):

- ``title``      -> ``english`` analyzer (standard tokenize, lowercase,
                    english stopwords, stemming).  We implement
                    tokenize+lowercase+stopwords; stemming is intentionally
                    approximated away (SURVEY §7 "hard parts") — it affects
                    recall only on stemmed-variant tokens and our oracle
                    encodes the same semantics on both sides.
- default fields -> ``standard`` analyzer: split on non-alphanumeric,
                    lowercase (dataSample, format, category, targetUri).
- ``sourceUri``  -> custom ``uri_analyzer``: ``lowercase`` tokenizer (splits
                    on non-letters) + stopwords {http, https, ftp, www, com}
                    (data_catalog/configuration_const.py:68-84).

Tokenization is defined by *regular expressions shared verbatim* between the
Python compiler (tokenizing query literals at compile time), the Spark plan
(``rlike`` match predicates — JVM-side, whole-stage-codegen friendly), and
the DuckDB oracle SQL (``regexp_matches``).  Alphanumeric-only tokens mean
the same pattern is valid in Java regex and RE2.

Scale note: matching via a codegen'd regexp over the scan beats materialized
token-array columns for the catalog's short fields; at 100 TB a write-time
token column + bloom filter / inverted index table would be layered on top,
but correctness never depends on it.
"""

from __future__ import annotations

import re

# Splitting rules (the character classes are reused to build match patterns).
STANDARD_SPLIT = "[^a-z0-9]+"
URI_SPLIT = "[^a-z]+"

_STANDARD_SPLIT_RE = re.compile(STANDARD_SPLIT)
_URI_SPLIT_RE = re.compile(URI_SPLIT)

# uri_analyzer stop-filter — data_catalog/configuration_const.py:77-80.
URI_STOPWORDS = frozenset({"http", "https", "ftp", "www", "com"})

# A small english stopword set for the `english`-analyzed title field and for
# the text-quality operators (ES uses the lucene default english set; any
# fixed deterministic set preserves the reference's *semantics* — stopwords
# never match).
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def standard_tokens(text: str) -> list[str]:
    """Standard analyzer: lowercase, split on non-alphanumeric."""
    return [t for t in _STANDARD_SPLIT_RE.split(text.lower()) if t]


def english_tokens(text: str) -> list[str]:
    """English-ish analyzer: standard tokens minus english stopwords."""
    return [t for t in standard_tokens(text) if t not in ENGLISH_STOPWORDS]


def uri_tokens(text: str) -> list[str]:
    """uri_analyzer: lowercase tokenizer (split on non-letters) + stop-filter.

    Reference: data_catalog/configuration_const.py:68-84; e.g.
    ``http://www.foo.com/bar`` -> ``[foo, bar]``.
    """
    return [t for t in _URI_SPLIT_RE.split(text.lower()) if t and t not in URI_STOPWORDS]


def token_match_pattern(tokens: list[str], split_class: str) -> str | None:
    """Regex matching a string whose token set intersects ``tokens``.

    ``split_class`` is the analyzer's splitting class (e.g. "[^a-z0-9]+");
    the boundary class is derived from it so "token membership" and "regex
    match on the raw lowered string" are exactly equivalent for tokens drawn
    from the complement alphabet.  Valid in Java regex (Spark ``rlike``) and
    RE2 (DuckDB ``regexp_matches``) alike.
    """
    toks = sorted(set(tokens))
    if not toks:
        return None
    boundary = split_class.rstrip("+")  # "[^a-z0-9]"
    alt = "|".join(re.escape(t) for t in toks)
    return f"(^|{boundary})({alt})({boundary}|$)"


# -- english suffix stemming (SURVEY hard-parts: configuration_const.py:26-29
# uses ES's `english` analyzer; full Porter is ES-internal — this is the
# deterministic, engine-portable plural-folding subset: Porter step 1a
# + common 'ies'/'sses' folding, spelled as an ordered regexp chain that
# renders identically in Spark and DuckDB, differing only in the
# backreference syntax ($1 vs \1)).

STEM_RULES: list[tuple[str, str]] = [
    (r"sses$", "ss"),     # classes  -> class
    (r"ies$", "i"),       # queries  -> queri (Porter folds both query/queries here)
    (r"([^su])s$", "$1"), # widgets  -> widget; keeps 'ss'/'us' endings
]


def stem(token: str) -> str:
    """Pure-python twin of the SQL renderings below (used in tests)."""
    import re

    for pat, rep in STEM_RULES:
        new = re.sub(pat, rep.replace("$1", r"\1"), token)
        if new != token:
            return new
    return token


def _stem_chain(var: str, backref: str) -> str:
    """First-match-wins as a CASE chain (NOT nested replaces — applying
    rule 3 after rule 2 would double-strip)."""
    branches = []
    for pat, rep in STEM_RULES:
        r = rep.replace("$1", backref)
        branches.append(
            f"WHEN regexp_replace({var}, '{pat}', '{r}') != {var} "
            f"THEN regexp_replace({var}, '{pat}', '{r}')"
        )
    return "CASE " + " ".join(branches) + f" ELSE {var} END"


def spark_stem_expr(var: str = "x") -> str:
    return _stem_chain(var, "$1")


def duck_stem_expr(var: str = "x") -> str:
    return _stem_chain(var, r"\1")
