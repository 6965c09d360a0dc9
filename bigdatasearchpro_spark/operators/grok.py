"""Grok and dissect expression compilers for the ingest pipeline —
the two most-used log-parsing processors in real ES ingest pipelines
(the r7-verdict gap #1; the ingest ring re-homes the reference's
row-transform loop, BulkProcessImpl.java:110-131).

Both compile ONCE at pipeline PUT time into a single combined regex +
a typed field list, and apply as ONE projection of JVM-side
``regexp_extract`` expressions — no Python in the row path, the whole
parse stays inside the scan's codegen span and scales like any other
narrow projection at 100 TB.

Grok syntax: a regex extended with ``%{PATTERN}``, ``%{PATTERN:field}``
or ``%{PATTERN:field:type}`` tokens resolved against a pattern
dictionary (the public grok-core names: WORD, IP, NUMBER,
TIMESTAMP_ISO8601, HTTPDATE, LOGLEVEL, GREEDYDATA, ...), with
``pattern_definitions`` overriding/extending per processor.  The
compiled pattern keeps backtracking bounded (an RE2-safe subset: no
backreferences, dictionary entries are non-capturing).

Dissect syntax: a purely positional template — ``%{field}`` keys
between literal separators, ``%{}``/``%{?name}`` skip keys, and the
``->`` right-pad modifier (the following separator may repeat).  No
user regex at all; the template compiles to anchored literal
separators with non-greedy gaps.
"""

from __future__ import annotations

import re
import warnings

from pyspark.sql import Column
from pyspark.sql import functions as F

# The public grok core names (RE2-safe subset: no backreferences; all
# groups non-capturing).  QUOTEDSTRING is the simplified no-escape
# form — the full grok QS uses backreferences, which this engine
# deliberately rejects (same policy as the gsub/script processors).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "POSINT": r"\d+",
    "NONNEGINT": r"\d+",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"[A-Za-z0-9](?:[A-Za-z0-9._-]*[A-Za-z0-9])?",
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[A-Za-z0-9][A-Za-z0-9._-]*)",
    "HOSTPORT": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[A-Za-z0-9][A-Za-z0-9._-]*):\d+",
    "USER": r"[a-zA-Z0-9._-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "MAC": r"(?:[0-9a-fA-F]{2}:){5}[0-9a-fA-F]{2}",
    "YEAR": r"\d{4}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:[0-2]?\d|3[01])",
    "MONTH": (r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
              r"[a-z]*"),
    "TIME": r"\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?"
        r"(?:Z|[+-]\d{2}:?\d{2})?"
    ),
    "HTTPDATE": (
        r"(?:[0-2]?\d|3[01])/"
        r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)/"
        r"\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}"
    ),
    "LOGLEVEL": (
        r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|"
        r"CRIT(?:ICAL)?|FATAL|SEVERE|ALERT|EMERG(?:ENCY)?)"
    ),
    "QUOTEDSTRING": r"\"[^\"]*\"",
    "QS": r"\"[^\"]*\"",
    # composite patterns: dictionary bodies that CONTAIN named tokens —
    # a bare %{COMMONAPACHELOG} in an expression introduces all of its
    # fields (textual pre-expansion in compile_grok, like ES grok)
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
        r"\[%{HTTPDATE:timestamp}\] "
        r'"%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?" '
        r"%{INT:response:int} (?:%{INT:bytes:long}|-)"
    ),
    "COMBINEDAPACHELOG": (
        r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}"
    ),
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "LOGLINE_PREFIX": r"\[[^\]]*\]",
}

_TOKEN_RE = re.compile(r"%\{([A-Z0-9_]+)(?::([A-Za-z0-9_@.\-]+)"
                       r"(?::(int|long|float|double|string))?)?\}")

_TYPE_CAST = {"int": "int", "long": "bigint",
              "float": "double", "double": "double", "string": None}

_MAX_EXPAND_DEPTH = 8


def _expand(name: str, defs: dict[str, str], depth: int = 0) -> str:
    """Resolve a dictionary pattern, recursively expanding embedded
    ``%{NAME}`` references as non-capturing groups."""
    if depth > _MAX_EXPAND_DEPTH:
        raise ValueError(f"grok pattern {name!r} nests too deep")
    if name not in defs:
        raise ValueError(f"unknown grok pattern %{{{name}}}")
    body = defs[name]
    return _TOKEN_RE.sub(
        lambda m: "(?:" + _expand(m.group(1), defs, depth + 1) + ")", body
    )


def _decapture(literal: str) -> str:
    """Turn bare user capture groups into non-capturing ones so
    %{...:field} group numbering stays stable.  Character-class aware:
    a ``(`` inside ``[...]`` is a literal, not a group, and must NOT be
    rewritten (rewriting it would inject ``?:`` into the class)."""
    out: list[str] = []
    in_class = False
    class_start = False  # just after '[' (and an optional '^'): a
    # leading ']' there is a LITERAL, not the class close ('[^]()]')
    i, n = 0, len(literal)
    while i < n:
        c = literal[i]
        if c == "\\" and i + 1 < n:
            out.append(literal[i:i + 2])
            i += 2
            class_start = False
            continue
        if in_class:
            if c == "^" and class_start:
                pass  # negation marker keeps the literal-']' window open
            elif c == "]" and not class_start:
                in_class = False
            else:  # including a leading ']' — literal, not the close
                class_start = False
        elif c == "[":
            in_class = True
            class_start = True
        elif c == "(" and not literal.startswith("(?", i):
            out.append("(?:")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def compile_grok(
    expr: str, pattern_definitions: "dict[str, str] | None" = None,
) -> "tuple[str, list[tuple[str, str | None]]]":
    """Compile a grok expression to ``(java_regex, fields)`` where
    ``fields`` is ``[(field_name, cast_type_or_None), ...]`` in capture
    group order (group i+1 extracts fields[i]).

    COMPOSITE dictionary entries (bodies containing named tokens, e.g.
    COMMONAPACHELOG) are textually pre-expanded so a bare
    ``%{COMBINEDAPACHELOG}`` introduces every field it defines, like
    ES grok.  A NAMED reference to a composite (``%{COMMONAPACHELOG:
    line}``) captures the whole match and drops the inner names (the
    flat group-numbering contract).

    User ``pattern_definitions`` bodies are de-captured on entry: a
    bare ``(foo|bar)`` in a dictionary value would otherwise shift the
    flat group numbering so every LATER field extracts the wrong group
    (the ADVICE r8 finding) — the built-in dictionary keeps the same
    invariant by construction (all groups non-capturing)."""
    defs = dict(GROK_PATTERNS)
    if pattern_definitions:
        defs.update({k: _decapture(v)
                     for k, v in pattern_definitions.items()})

    # textual pre-expansion: bare references whose bodies define named
    # tokens inline their bodies (recursively, bounded depth)
    def _is_composite(name: str) -> bool:
        body = defs.get(name, "")
        return any(m.group(2) for m in _TOKEN_RE.finditer(body))

    for _ in range(_MAX_EXPAND_DEPTH):
        expanded = _TOKEN_RE.sub(
            lambda m: ("(?:" + defs[m.group(1)] + ")")
            if m.group(2) is None and m.group(1) in defs
            and _is_composite(m.group(1))
            else m.group(0),
            expr,
        )
        if expanded == expr:
            break
        expr = expanded
    else:
        raise ValueError("grok composite expansion nests too deep")

    out: list[str] = []
    fields: list[tuple[str, str | None]] = []
    pos = 0
    for m in _TOKEN_RE.finditer(expr):
        out.append(_decapture(expr[pos:m.start()]))
        name, field, typ = m.group(1), m.group(2), m.group(3)
        body = _expand(name, defs)
        if field:
            out.append("(" + body + ")")
            fields.append((field, _TYPE_CAST.get(typ or "string")))
        else:
            out.append("(?:" + body + ")")
        pos = m.end()
    out.append(_decapture(expr[pos:]))
    if not fields:
        raise ValueError("grok expression extracts no fields "
                         "(no %{PATTERN:field} tokens)")
    combined = "".join(out)
    # PUT-time validation, like ES grok: a malformed literal segment
    # (unbalanced paren, bad class) must fail HERE with a ValueError,
    # not at read time as a raw engine exception inside a running
    # ingest.  Python re accepts the whole RE2-safe subset this
    # compiler emits, so it is a sound syntax gate for it.  A
    # FutureWarning ("Possible nested set", a bare '[' inside a class)
    # is ALSO rejected: Java regex — where this pattern actually runs,
    # via rlike/regexp_extract — treats '[[' as a class union, so the
    # two engines would diverge on exactly those inputs.
    with warnings.catch_warnings():
        warnings.simplefilter("error", FutureWarning)
        try:
            re.compile(combined)
        except (re.error, FutureWarning) as e:
            raise ValueError(
                f"grok pattern does not compile: {e}") from None
    return combined, fields


_DISSECT_KEY_RE = re.compile(r"%\{([^}]*)\}")


def compile_dissect(pattern: str) -> "tuple[str, list[str]]":
    """Compile a dissect template to ``(anchored_java_regex, fields)``.
    Keys become non-greedy gaps (the final key greedy), skip keys
    (``%{}`` / ``%{?name}``) become non-capturing, a ``->`` pad
    modifier lets the following literal separator repeat, and append
    keys (``%{+name}``) repeat a field name — ``fields`` then contains
    the name once per capture, in group order (the caller joins)."""
    parts = _DISSECT_KEY_RE.split(pattern)
    # parts alternates literal, key, literal, key, ... literal
    keys = parts[1::2]
    lits = parts[0::2]
    if not keys:
        raise ValueError("dissect pattern has no %{key} tokens")
    for i in range(1, len(keys)):
        if lits[i] == "":
            raise ValueError(
                "dissect needs a literal separator between consecutive keys")
    regex = ["^", re.escape(lits[0])]
    fields: list[str] = []
    for i, key in enumerate(keys):
        pad = key.endswith("->")
        if pad:
            key = key[:-2]
        if key.startswith("+"):  # append modifier: same field again
            key = key[1:]
            if not key:
                raise ValueError("dissect %{+} needs a field name")
        skip = key == "" or key.startswith("?")
        last = i == len(keys) - 1
        gap = ".*" if last else ".*?"
        regex.append(f"(?:{gap})" if skip else f"({gap})")
        if not skip:
            fields.append(key)
        trail = re.escape(lits[i + 1])
        if pad and trail:
            # '->' : the next separator may repeat (right padding)
            regex.append(f"(?:{trail})+")
        else:
            regex.append(trail)
    regex.append("$")
    if not fields:
        raise ValueError("dissect pattern extracts no named keys")
    return "".join(regex), fields


def grok_columns(
    source: Column, expr: "str | list[str]",
    pattern_definitions: "dict[str, str] | None" = None,
) -> "dict[str, Column]":
    """field name -> typed extraction Column (NULL when the line does
    not match, like an ES grok failure with ignore_failure).

    ``expr`` may be a LIST of grok expressions — the ES processor's
    ``patterns`` array, tried in order with FIRST-MATCH-WINS per line:
    each field's column is a chained CASE over the per-pattern match
    guards, so a line parsed by pattern 2 yields pattern 2's fields
    and NULL for fields only pattern 1 defines.  Single compile per
    pattern; still one projection."""
    exprs = [expr] if isinstance(expr, str) else list(expr)
    if not exprs:
        raise ValueError("grok needs at least one pattern")
    compiled = []
    for e in exprs:
        regex, fields = compile_grok(e, pattern_definitions)
        compiled.append((regex, fields, source.rlike(regex)))
    # ordered union of field names; first definition fixes the cast
    order: list[str] = []
    casts: dict[str, "str | None"] = {}
    for _, fields, _m in compiled:
        for f, cast in fields:
            if f not in casts:
                order.append(f)
                casts[f] = cast
    cols: dict[str, Column] = {}
    for f in order:
        col = None
        for regex, fields, matched in compiled:
            fmap = {name: i for i, (name, _c) in enumerate(fields)}
            val = (
                F.regexp_extract(source, regex, fmap[f] + 1)
                if f in fmap
                else F.lit(None).cast("string")
            )
            col = F.when(matched, val) if col is None else col.when(
                matched, val)
        # try_cast, not cast: a capture inside an optional/alternation
        # group that did not participate extracts as '' (e.g. apache
        # bytes on a 304: "(?:%{INT:bytes:long}|-)" with '-') — under
        # ANSI a plain cast THROWS on the first such line; ES grok
        # leaves the field unset, so NULL is the faithful semantics
        cols[f] = col.try_cast(casts[f]) if casts[f] else col
    return cols


def dissect_columns(
    source: Column, pattern: str, append_separator: str = "",
) -> "dict[str, Column]":
    """field name -> extraction Column (NULL on non-matching lines).
    A field captured more than once (the ``%{+name}`` append modifier)
    joins its captures in order with ``append_separator``."""
    regex, fields = compile_dissect(pattern)
    matched = source.rlike(regex)
    groups: dict[str, list[Column]] = {}
    for i, field in enumerate(fields):
        groups.setdefault(field, []).append(
            F.regexp_extract(source, regex, i + 1))
    return {
        field: F.when(
            matched,
            parts[0] if len(parts) == 1
            else F.concat_ws(append_separator, *parts),
        )
        for field, parts in groups.items()
    }
