"""Configurable analyzers (SURVEY.md L3; VERDICT r4 task 5).

ES 6.x lets every field choose an analyzer; the reference exposes that
surface by delegation (search form posts straight to ES,
``indexView.html:13-19``).  Until round 5 only the standard-alike
existed; this module adds the per-field analyzer registry and keeps the
ES contract the engine's search ring relies on: **index-time and
query-time analysis are the same function**, one implemented as a Spark
Column expression (JVM-side, inside whole-stage codegen — never a
Python UDF) and once as driver-side Python for the literal query terms.
Both sides are generated from the same rule table, and a property test
pins their symmetry.

Analyzers:

- ``standard``: lowercase + split on non-alphanumeric runs — bit-
  identical to the pre-round-5 behavior (the default everywhere).
- ``whitespace``: split on whitespace only, NO lowercasing (ES's
  whitespace analyzer is case-sensitive).
- ``english``: standard tokenization, Lucene's classic 33-word English
  stop set, then a light suffix-strip stemmer (plural rules in the
  spirit of Lucene's EnglishMinimalStemFilter plus -ing/-ed stripping).
  Deliberately NOT Porter: every rule is a single suffix comparison so
  the whole stemmer stays one CASE expression — expressible identically
  in Spark, Python, and the DuckDB oracle.  No e-restoration is
  attempted (``merged`` stems to ``merg``); the rules are deterministic
  and symmetric, which is the property search correctness needs.

- ``cjk``: latin words tokenize like standard; runs of CJK ideographs
  emit overlapping bigrams (a lone ideograph emits itself) — ES's
  ``cjk`` analyzer shape, the standard no-dictionary treatment of
  unsegmented Chinese/Japanese/Korean text.

Scale: all analyzers are narrow per-row expressions — no explode, no
shuffle, no UDF; the analyzer choice changes the expression tree only.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

# Lucene StandardAnalyzer / StopAnalyzer classic English stop set.
STOPWORDS_EN = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)

TOKEN_SPLIT_RE = "[^a-z0-9]+"  # standard analyzer split (post-lowercase)
WHITESPACE_SPLIT_RE = r"\s+"

# Light stemmer rule table: (suffix, min_token_len, replacement,
# excluded_endings).  First matching rule wins; no match = unchanged.
# Kept as data so the Spark expression, the Python twin, and the DuckDB
# oracle SQL are all generated from the SAME rules.
STEM_RULES: tuple[tuple[str, int, str, tuple[str, ...]], ...] = (
    ("ies", 5, "y", ()),
    ("sses", 5, "ss", ()),
    ("xes", 5, "x", ()),
    ("ches", 6, "ch", ()),
    ("shes", 6, "sh", ()),
    ("zes", 5, "z", ()),
    ("s", 4, "", ("ss", "us", "is")),
    ("ing", 6, "", ()),
    ("ed", 6, "", ()),
)


# French light stemmer rule table (same shape, first match wins) —
# in the spirit of Lucene's FrenchMinimalStemFilter, restricted to
# single-suffix rules so the stemmer stays one CASE expression.
# Applied AFTER accent folding (rules are pure ASCII).
STEM_RULES_FR: tuple[tuple[str, int, str, tuple[str, ...]], ...] = (
    ("eaux", 7, "eau", ()),
    ("aux", 6, "al", ()),
    ("x", 6, "", ()),
    ("es", 6, "", ()),
    ("s", 6, "", ("ss", "us")),
    ("e", 7, "", ()),
)

# German light stemmer rule table — in the spirit of Lucene's
# GermanLightStemFilter (plural/case endings), applied AFTER umlaut/
# eszett folding.
STEM_RULES_DE: tuple[tuple[str, int, str, tuple[str, ...]], ...] = (
    ("ern", 6, "", ()),
    ("er", 5, "", ()),
    ("en", 5, "", ()),
    ("es", 5, "", ()),
    ("e", 5, "", ()),
    ("n", 5, "", ()),
    ("s", 5, "", ("ss",)),
)

# Russian light stemmer rule table — RussianLightStemFilter spirit
# (adjectival + noun case endings, single pass, longest suffix first),
# applied AFTER ё->е folding.  Lengths are in CHARACTERS (both Spark
# length() and DuckDB length() count codepoints, so the same table
# drives all three twins beyond Latin-1).
STEM_RULES_RU: tuple[tuple[str, int, str, tuple[str, ...]], ...] = (
    ("иями", 8, "", ()),
    ("иях", 7, "", ()),
    ("иям", 7, "", ()),
    ("ями", 7, "", ()),
    ("ами", 7, "", ()),
    ("ыми", 7, "", ()),
    ("ими", 7, "", ()),
    ("ого", 7, "", ()),
    ("его", 7, "", ()),
    ("ому", 7, "", ()),
    ("ему", 7, "", ()),
    ("ах", 6, "", ()),
    ("ях", 6, "", ()),
    ("ам", 6, "", ()),
    ("ям", 6, "", ()),
    ("ом", 6, "", ()),
    ("ем", 6, "", ()),
    ("ов", 6, "", ()),
    ("ев", 6, "", ()),
    ("ый", 6, "", ()),
    ("ий", 6, "", ()),
    ("ой", 6, "", ()),
    ("ая", 6, "", ()),
    ("яя", 6, "", ()),
    ("ое", 6, "", ()),
    ("ее", 6, "", ()),
    ("ую", 6, "", ()),
    ("юю", 6, "", ()),
    ("ия", 6, "", ()),
    ("ие", 6, "", ()),
    ("ии", 6, "", ()),
    ("ей", 6, "", ()),
    ("а", 5, "", ()),
    ("я", 5, "", ()),
    ("о", 5, "", ()),
    ("е", 5, "", ()),
    ("у", 5, "", ()),
    ("ю", 5, "", ()),
    ("ы", 5, "", ()),
    ("и", 5, "", ()),
    ("й", 5, "", ()),
    ("ь", 5, "", ()),
)

# Spanish light stemmer rule table — SpanishLightStemFilter spirit
# (plural + gender endings), applied AFTER accent folding.
STEM_RULES_ES: tuple[tuple[str, int, str, tuple[str, ...]], ...] = (
    ("ciones", 8, "cion", ()),
    ("os", 5, "", ()),
    ("as", 5, "", ()),
    ("es", 5, "", ()),
    ("s", 5, "", ("ss",)),
    ("o", 5, "", ()),
    ("a", 5, "", ()),
    ("e", 5, "", ()),
)

# Italian light stemmer rule table — ItalianLightStemFilter spirit
# (plural/gender vowel endings + -zioni/-zione), applied AFTER accent
# folding.
STEM_RULES_IT: tuple[tuple[str, int, str, tuple[str, ...]], ...] = (
    ("zioni", 8, "zion", ()),
    ("zione", 8, "zion", ()),
    ("i", 5, "", ()),
    ("e", 5, "", ()),
    ("o", 5, "", ()),
    ("a", 5, "", ()),
)

# Portuguese light stemmer rule table — PortugueseMinimalStem spirit
# (plural forms incl. -ões->ão, -ais->al on the FOLDED alphabet, so
# 'operações'→'operacao' and the singular 'operação'→'operacao' — the
# ("o", ..., excluded "ao") rule keeps the nasal-suffix singulars
# intact; exclusions skip the rule and fall through).
STEM_RULES_PT: tuple[tuple[str, int, str, tuple[str, ...]], ...] = (
    ("oes", 6, "ao", ()),
    ("aes", 6, "ao", ()),
    ("ais", 6, "al", ()),
    ("eis", 6, "el", ()),
    ("as", 6, "", ()),
    ("os", 6, "", ()),
    ("es", 5, "", ()),
    ("s", 5, "", ("ss",)),
    ("o", 6, "", ("ao",)),
    ("a", 6, "", ()),
    ("e", 6, "", ()),
)


def stem_token(t: str, rules=STEM_RULES) -> str:
    """Driver-side light stemmer (query analysis)."""
    for suffix, min_len, repl, excluded in rules:
        if (
            len(t) >= min_len
            and t.endswith(suffix)
            and not any(t.endswith(e) for e in excluded)
        ):
            return t[: len(t) - len(suffix)] + repl
    return t


def stem_expr(t: Column, rules=STEM_RULES) -> Column:
    """The SAME rules as :func:`stem_token`, as one CASE expression."""
    out = t
    # build the CASE bottom-up so the first rule ends up outermost
    for suffix, min_len, repl, excluded in reversed(rules):
        cond = (F.length(t) >= min_len) & t.endswith(suffix)
        for e in excluded:
            cond = cond & ~t.endswith(e)
        stemmed = F.concat(
            t.substr(F.lit(1), F.length(t) - len(suffix)), F.lit(repl)
        )
        out = F.when(cond, stemmed).otherwise(out)
    return out


def stem_case_sql(var: str = "t", rules=STEM_RULES) -> str:
    """The SAME rules as ANSI-ish SQL (DuckDB oracle side)."""
    clauses = []
    for suffix, min_len, repl, excluded in rules:
        cond = f"length({var}) >= {min_len} AND ends_with({var}, '{suffix}')"
        for e in excluded:
            cond += f" AND NOT ends_with({var}, '{e}')"
        expr = f"substr({var}, 1, length({var}) - {len(suffix)}) || '{repl}'"
        clauses.append(f"WHEN {cond} THEN {expr}")
    return "CASE " + " ".join(clauses) + f" ELSE {var} END"


# ---------------------------------------------------------------------------
# Accent/umlaut folding (french/german analyzers run on FOLDED ASCII so
# the tokenizer split, the stem rules, and every SQL twin stay pure
# [a-z0-9]; ES users get the same effect pairing language analyzers
# with asciifolding). One fold table per language, single source for
# the Spark expression, the Python twin, and the SQL generator.
# ---------------------------------------------------------------------------

FOLD_FR: tuple[tuple[str, str], ...] = (
    ("œ", "oe"), ("æ", "ae"),   # œ æ (multi-char first)
    ("à", "a"), ("â", "a"), ("ä", "a"),
    ("é", "e"), ("è", "e"), ("ê", "e"), ("ë", "e"),
    ("î", "i"), ("ï", "i"),
    ("ô", "o"), ("ö", "o"),
    ("ù", "u"), ("û", "u"), ("ü", "u"),
    ("ç", "c"),
)

FOLD_DE: tuple[tuple[str, str], ...] = (
    ("ß", "ss"),                      # ß
    ("ä", "a"), ("ö", "o"), ("ü", "u"),
)

FOLD_ES: tuple[tuple[str, str], ...] = (
    ("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"), ("ú", "u"),
    ("ü", "u"), ("ñ", "n"),
)

FOLD_IT: tuple[tuple[str, str], ...] = (
    ("à", "a"), ("è", "e"), ("é", "e"), ("ì", "i"),
    ("ò", "o"), ("ó", "o"), ("ù", "u"),
)

FOLD_PT: tuple[tuple[str, str], ...] = (
    ("á", "a"), ("â", "a"), ("ã", "a"), ("à", "a"),
    ("é", "e"), ("ê", "e"), ("í", "i"),
    ("ó", "o"), ("ô", "o"), ("õ", "o"), ("ú", "u"), ("ç", "c"),
)

# Russian folds to CYRILLIC, not ASCII (the first non-Latin-1 family):
# the canonical RussianAnalyzer normalization is ё -> е; the token
# split keeps the а-я run (see TOKEN_SPLIT_RE_RU).
FOLD_RU: tuple[tuple[str, str], ...] = (
    ("ё", "е"),
)

# standard split keeps [a-z0-9]; the russian analyzer must also keep
# the lowercase cyrillic block (ё is already folded to е)
TOKEN_SPLIT_RE_RU = "[^a-zа-я0-9]+"


def fold_expr(text: Column, fold: tuple[tuple[str, str], ...]) -> Column:
    out = F.lower(text)
    for src, dst in fold:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def fold_token(q: str, fold: tuple[tuple[str, str], ...]) -> str:
    out = q.lower()
    for src, dst in fold:
        out = out.replace(src, dst)
    return out


def fold_sql(expr: str, fold: tuple[tuple[str, str], ...]) -> str:
    """The SAME folding as a DuckDB replace() chain."""
    out = f"lower({expr})"
    for src, dst in fold:
        out = f"replace({out}, '{src}', '{dst}')"
    return out


def _standard_tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def _whitespace_tokens(text: Column) -> Column:
    return F.filter(F.split(text, WHITESPACE_SPLIT_RE), lambda t: t != "")


# CJK unified ideographs (the BMP block ES's cjk analyzer covers first)
CJK_RUN_RE = "[\u4e00-\u9fff]+"


def _cjk_tokens(text: Column) -> Column:
    """ES ``cjk`` analyzer shape: latin words tokenize like standard,
    and every run of CJK ideographs emits OVERLAPPING BIGRAMS (a lone
    ideograph emits itself) — the standard no-dictionary approach to
    unsegmented Chinese/Japanese text. Pure array expressions."""
    latin = _standard_tokens(text)
    runs = F.regexp_extract_all(text, F.lit(CJK_RUN_RE), 0)
    bigrams = F.flatten(
        F.transform(
            runs,
            lambda r: F.when(F.length(r) == 1, F.array(r)).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.length(r) - 1),
                    lambda i: r.substr(i, F.lit(2)),
                )
            ),
        )
    )
    return F.concat(latin, bigrams)


def _english_tokens(text: Column) -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    kept = F.filter(
        _standard_tokens(text), lambda t: ~F.array_contains(stops, t)
    )
    # single-arg lambda: F.transform would otherwise pass the element
    # INDEX into stem_expr's new `rules` parameter
    return F.transform(kept, lambda t: stem_expr(t))


# Folded-ASCII stop sets (Lucene French/German stop lists, trimmed to
# the high-frequency core; the French single letters are the elision
# clitics l' d' j' ... which the standard split leaves as lone tokens).
STOPWORDS_FR = (
    "au", "aux", "avec", "ce", "ces", "cette", "dans", "de", "des", "du",
    "elle", "elles", "en", "est", "et", "etre", "il", "ils", "je", "la",
    "le", "les", "leur", "lui", "mais", "ne", "ni", "nous", "on", "ou",
    "par", "pas", "plus", "pour", "que", "qui", "sa", "se", "ses", "son",
    "sont", "sur", "tu", "un", "une", "vous", "y", "a",
    "l", "d", "j", "c", "m", "n", "s", "t", "qu",
)

STOPWORDS_ES = (
    "al", "como", "con", "de", "del", "el", "ella", "ellas", "ellos",
    "en", "entre", "es", "esta", "estas", "este", "estos", "la", "las",
    "lo", "los", "mas", "no", "o", "para", "pero", "por", "que", "se",
    "si", "sin", "sobre", "son", "su", "sus", "un", "una", "unas",
    "unos", "y", "ya", "a",
)

# Lucene Italian stop core (subset), in FOLDED form (è->e, più->piu).
STOPWORDS_IT = (
    "di", "a", "da", "in", "con", "su", "per", "tra", "fra", "il",
    "lo", "la", "i", "gli", "le", "un", "uno", "una", "e", "o", "ma",
    "se", "che", "non", "piu", "come", "anche", "del", "della", "dei",
    "delle", "al", "alla", "nel", "nella", "sono", "questo", "questa",
)

# Lucene Portuguese stop core (subset), in FOLDED form (não->nao,
# são->sao).
STOPWORDS_PT = (
    "de", "a", "o", "que", "e", "do", "da", "em", "um", "para", "com",
    "nao", "uma", "os", "no", "se", "na", "por", "mais", "as", "dos",
    "como", "mas", "ao", "das", "ou", "sem", "sao", "aos", "nas",
)

STOPWORDS_DE = (
    "aber", "als", "am", "an", "auch", "auf", "aus", "bei", "das", "dem",
    "den", "der", "des", "die", "durch", "ein", "eine", "einem", "einen",
    "einer", "eines", "er", "es", "fur", "ich", "im", "in", "ist", "mit",
    "nach", "nicht", "noch", "nur", "oder", "sie", "sind", "so", "uber",
    "und", "von", "war", "waren", "was", "wenn", "wer", "wie", "wir",
    "zu", "zum", "zur",
)


def _lang_tokens(
    text: Column,
    fold: tuple[tuple[str, str], ...],
    stops_list: tuple[str, ...],
    rules,
    split_re: str = TOKEN_SPLIT_RE,
) -> Column:
    stops = F.array(*[F.lit(s) for s in stops_list])
    toks = F.filter(
        F.split(fold_expr(text, fold), split_re), lambda t: t != ""
    )
    kept = F.filter(toks, lambda t: ~F.array_contains(stops, t))
    return F.transform(kept, lambda t: stem_expr(t, rules))


def _french_tokens(text: Column) -> Column:
    return _lang_tokens(text, FOLD_FR, STOPWORDS_FR, STEM_RULES_FR)


def _german_tokens(text: Column) -> Column:
    return _lang_tokens(text, FOLD_DE, STOPWORDS_DE, STEM_RULES_DE)


def _spanish_tokens(text: Column) -> Column:
    return _lang_tokens(text, FOLD_ES, STOPWORDS_ES, STEM_RULES_ES)


def _italian_tokens(text: Column) -> Column:
    return _lang_tokens(text, FOLD_IT, STOPWORDS_IT, STEM_RULES_IT)


def _portuguese_tokens(text: Column) -> Column:
    return _lang_tokens(text, FOLD_PT, STOPWORDS_PT, STEM_RULES_PT)


# Lucene Russian stop core (high-frequency function words)
STOPWORDS_RU = (
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как",
    "а", "то", "все", "она", "так", "его", "но", "да", "ты", "к",
    "у", "же", "вы", "за", "бы", "по", "только", "ее", "мне",
    "было", "вот", "от", "меня", "еще", "нет", "о", "из", "ему",
    "был", "до", "вас", "был", "них", "уж", "вам", "сам", "чем",
    "мы", "тебя", "их", "для", "без", "будет", "под", "же", "или",
    "ни", "быть", "него", "есть", "надо", "ней", "кто", "этот",
    "того", "потому", "этого", "какой", "ним", "этом", "мой", "тем",
    "чтобы", "нее", "были", "куда", "зачем", "при",
)


def _russian_tokens(text: Column) -> Column:
    return _lang_tokens(
        text, FOLD_RU, STOPWORDS_RU, STEM_RULES_RU, TOKEN_SPLIT_RE_RU
    )


def _standard_analyze(q: str) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT_RE, q.lower()) if t]


def _whitespace_analyze(q: str) -> list[str]:
    return [t for t in re.split(WHITESPACE_SPLIT_RE, q) if t]


def _cjk_analyze(q: str) -> list[str]:
    out = _standard_analyze(q)
    for run in re.findall(CJK_RUN_RE, q):
        if len(run) == 1:
            out.append(run)
        else:
            out.extend(run[i : i + 2] for i in range(len(run) - 1))
    return out


def _english_analyze(q: str) -> list[str]:
    return [
        stem_token(t) for t in _standard_analyze(q) if t not in STOPWORDS_EN
    ]


def _lang_analyze(q, fold, stops, rules, split_re=TOKEN_SPLIT_RE) -> list[str]:
    toks = [t for t in re.split(split_re, fold_token(q, fold)) if t]
    return [stem_token(t, rules) for t in toks if t not in stops]


def _french_analyze(q: str) -> list[str]:
    return _lang_analyze(q, FOLD_FR, STOPWORDS_FR, STEM_RULES_FR)


def _german_analyze(q: str) -> list[str]:
    return _lang_analyze(q, FOLD_DE, STOPWORDS_DE, STEM_RULES_DE)


def _spanish_analyze(q: str) -> list[str]:
    return _lang_analyze(q, FOLD_ES, STOPWORDS_ES, STEM_RULES_ES)


def _italian_analyze(q: str) -> list[str]:
    return _lang_analyze(q, FOLD_IT, STOPWORDS_IT, STEM_RULES_IT)


def _portuguese_analyze(q: str) -> list[str]:
    return _lang_analyze(q, FOLD_PT, STOPWORDS_PT, STEM_RULES_PT)


def _russian_analyze(q: str) -> list[str]:
    return _lang_analyze(
        q, FOLD_RU, STOPWORDS_RU, STEM_RULES_RU, TOKEN_SPLIT_RE_RU
    )


# name -> (Column tokenizer, driver-side query analyzer).  The two
# entries of each pair MUST stay semantically identical (ES contract);
# tests/test_search.py pins the symmetry property.


# ES edge_ngram analyzer (search-as-you-type, INDEX side): every
# standard token emits its prefixes of length min_gram..max_gram (a
# token shorter than min_gram emits nothing, exactly like Lucene's
# EdgeNGramTokenFilter). The matching search_analyzer is plain
# standard — ES's documented asymmetric pairing for autocomplete
# fields — which is precisely the (index expr, query analyze) slot
# shape of this table.
EDGE_NGRAM_MIN = 2
EDGE_NGRAM_MAX = 5


def _edge_ngram_tokens(text: Column) -> Column:
    toks = _standard_tokens(text)

    def grams(t: Column) -> Column:
        prefixes = F.array(
            *[t.substr(1, n)
              for n in range(EDGE_NGRAM_MIN, EDGE_NGRAM_MAX + 1)]
        )
        # keep prefix #i only while the token is long enough that
        # substr produced a FULL prefix of that length (substr clamps,
        # so shorter tokens would repeat themselves otherwise)
        return F.filter(
            prefixes,
            lambda x, i: F.length(t) >= i + F.lit(EDGE_NGRAM_MIN),
        )

    return F.flatten(F.transform(toks, lambda t: grams(t)))


def _edge_ngram_analyze(q: str) -> list[str]:
    # search_analyzer: standard (the user's partial input is matched
    # verbatim against the indexed prefix grams)
    return _standard_analyze(q)



def _fingerprint_tokens(text: Column) -> Column:
    """ES ``fingerprint`` analyzer: lowercase, standard-split, DEDUPE,
    SORT, join with a single space — emitting ONE token, the document's
    canonical fingerprint (the OpenRefine clustering key; ES ships it
    for exactly the dedup/clustering use).  The stock filter chain also
    ASCII-folds; the fold is a no-op on ASCII corpora and language
    folds live in the per-language tables, so it is intentionally not
    duplicated here."""
    toks = _standard_tokens(text)
    return F.array(
        F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    )


def _fingerprint_analyze(q: str) -> list[str]:
    return [" ".join(sorted(set(_standard_analyze(q))))]


# ES ``phonetic`` analyzer (the phonetic plugin's soundex encoder,
# public algorithm): every standard token is replaced by its soundex
# code — first letter + three digits from the consonant-class table,
# adjacent equal codes collapsed, vowels dropped, h/w transparent —
# so "querry" and "query" (q600), "windoe" and "window" (w530) index
# identically.  Kept LOWERCASE (this pipeline's convention; classic
# presentation uppercases).  Non-alpha chars (digits) pass through the
# translate untouched and act as their own code class — deterministic
# and mirrored bit-identically in the Python twin and the DuckDB
# oracle chain (which collapses runs via a list comprehension because
# RE2 has no backreferences).
_SOUNDEX_FROM = "bfpvcgjkqsxzdtlmnraeiouy"
_SOUNDEX_TO = "111122222222334556000000"
_SOUNDEX_TABLE = str.maketrans(_SOUNDEX_FROM, _SOUNDEX_TO)


def soundex_token(t: str) -> str:
    """Classic soundex of one (lowercase) token — the Python twin of
    :func:`_soundex_expr`; must stay bit-identical to it and to the
    oracle SQL chain."""
    if not t:
        return t
    first, rest = t[0], re.sub(r"[hw]", "", t[1:])
    digits = (first + rest).translate(_SOUNDEX_TABLE)
    collapsed = re.sub(r"(.)\1+", r"\1", digits)
    tail = collapsed[1:].replace("0", "")
    return first + (tail + "000")[:3]


def _soundex_expr(t: Column) -> Column:
    first = t.substr(1, 1)
    rest = F.regexp_replace(t.substr(F.lit(2), F.length(t)), "[hw]", "")
    digits = F.translate(
        F.concat(first, rest), _SOUNDEX_FROM, _SOUNDEX_TO
    )
    collapsed = F.regexp_replace(digits, r"(.)\1+", r"$1")
    tail = F.regexp_replace(
        collapsed.substr(F.lit(2), F.length(collapsed)), "0", ""
    )
    return F.concat(first, F.rpad(tail.substr(1, 3), 3, "0"))


def _phonetic_tokens(text: Column) -> Column:
    toks = _standard_tokens(text)
    return F.transform(toks, lambda t: _soundex_expr(t))


def _phonetic_analyze(q: str) -> list[str]:
    return [soundex_token(t) for t in _standard_analyze(q)]


ANALYZERS = {
    "standard": (_standard_tokens, _standard_analyze),
    "whitespace": (_whitespace_tokens, _whitespace_analyze),
    "english": (_english_tokens, _english_analyze),
    "cjk": (_cjk_tokens, _cjk_analyze),
    "french": (_french_tokens, _french_analyze),
    "german": (_german_tokens, _german_analyze),
    "spanish": (_spanish_tokens, _spanish_analyze),
    "russian": (_russian_tokens, _russian_analyze),
    "italian": (_italian_tokens, _italian_analyze),
    "portuguese": (_portuguese_tokens, _portuguese_analyze),
    "edge_ngram": (_edge_ngram_tokens, _edge_ngram_analyze),
    "fingerprint": (_fingerprint_tokens, _fingerprint_analyze),
    "phonetic": (_phonetic_tokens, _phonetic_analyze),
}


# Analyzers whose query terms are STEMS rather than surface forms —
# highlighting must not expect a stem to \b-match the document text.
# (french/german stems are also accent-FOLDED, so prefix matching
# highlights only already-ASCII surface words — documented limit.)
STEMMING_ANALYZERS = frozenset(
    {"english", "french", "german", "spanish", "russian", "italian",
     "portuguese"}
)


# highlight_alternates needs each language's rule table to derive the
# inverse alternates for replacement (non-strip) rules.
_STEM_RULES_BY_ANALYZER = {
    "english": STEM_RULES,
    "french": STEM_RULES_FR,
    "german": STEM_RULES_DE,
    "spanish": STEM_RULES_ES,
    "italian": STEM_RULES_IT,
    "portuguese": STEM_RULES_PT,
    "russian": STEM_RULES_RU,
}


def highlight_alternates(terms: "list[str]", analyzer: str = "standard") -> "list[str]":
    """Regex alternates that highlight SURFACE forms for the ANALYZED
    query terms.

    Non-stemming analyzers: the analyzed term IS the surface form —
    match it exactly. Stemming analyzers: the term is a stem (e.g.
    ``tabl``), which never matches a surface word under ``\\b...\\b``;
    emit a prefix match on the stem (``tabl\\w*`` highlights table/
    tables/tabling). Strip-style rules (empty replacement, or a
    replacement that prefixes its suffix, e.g. ``ches``→``ch``) are
    covered by the prefix match; replacement rules whose suffix does
    NOT start with the replacement (``ies``→``y``, French
    ``aux``→``al``) get an explicit inverse alternate derived from the
    analyzer's OWN rule table (stem ``cheval`` also emits
    ``chevaux\\w*``), so FR/DE/ES highlights are not silently missed.
    ES re-analyzes the document to highlight; this is the regexp
    approximation."""
    if analyzer not in STEMMING_ANALYZERS:
        return [re.escape(t) for t in terms]
    rules = _STEM_RULES_BY_ANALYZER[analyzer]
    alts: list[str] = []
    for t in terms:
        alts.append(re.escape(t) + r"\w*")
        for suffix, min_len, repl, _excluded in rules:
            if not repl or suffix.startswith(repl):
                continue  # strip-style: covered by the prefix match
            # stem length implied by the rule's surface min length
            stem_min = min_len - len(suffix) + len(repl)
            if t.endswith(repl) and len(t) >= stem_min:
                alts.append(re.escape(t[: len(t) - len(repl)] + suffix) + r"\w*")
    return list(dict.fromkeys(alts))


def analyzer_tokens(text: Column, analyzer: str = "standard") -> Column:
    try:
        return ANALYZERS[analyzer][0](text)
    except KeyError:
        raise ValueError(
            f"unknown analyzer {analyzer!r} (have {sorted(ANALYZERS)})"
        ) from None


def analyzer_query(q: str, analyzer: str = "standard") -> list[str]:
    try:
        return ANALYZERS[analyzer][1](q)
    except KeyError:
        raise ValueError(
            f"unknown analyzer {analyzer!r} (have {sorted(ANALYZERS)})"
        ) from None
