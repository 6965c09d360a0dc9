"""Scripting DSL: the (restricted) Painless-expression subset behind
ES ``script_score`` queries, runtime fields (``runtime_mappings``),
and the ``scripted_metric`` aggregation.

The reference delegates its whole query surface to Elasticsearch
(indexView.html:13-19), where scripts are the standard escape hatch
for computed scores/fields.  A Painless interpreter would be a
row-at-a-time UDF — the anti-pattern at 100 TB — so this module
instead COMPILES the supported grammar to a native Spark ``Column``
expression tree (whole-stage codegen keeps it JVM-side) and, from the
same AST, to an equivalent SQL string the DuckDB oracle replays.

Grammar (arithmetic Painless subset)::

    expr    := term (('+'|'-') term)*
    term    := unary (('*'|'/') unary)*
    unary   := '-' unary | primary
    primary := NUMBER | '(' expr ')'
             | doc['field'].value | params.NAME | _score
             | Math.floor(expr) | Math.abs(expr)

Determinism contract: every operation is IEEE-correctly-rounded
(+ - * / abs floor on doubles) and BOTH emitters serialize the same
AST with the same operand order, so a script value is bit-identical
across engines whenever its inputs are — no libm, no rounding fudge
(the geo-haversine generation pattern, registry_geo.py).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+(?:\.\d+)?)"
    r"|doc\['(?P<field>[A-Za-z_][A-Za-z0-9_.]*)'\]\.value"
    r"|params\.(?P<param>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<score>_score)"
    r"|Math\.(?P<fn>floor|abs)\("
    r"|(?P<op>[-+*/()])"
    r")"
)

_FUNCS = ("floor", "abs")


def _lex(src: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ValueError(f"unsupported script syntax at: {src[pos:]!r}")
            break
        pos = m.end()
        if m.group("num") is not None:
            out.append(("num", float(m.group("num"))))
        elif m.group("field") is not None:
            out.append(("field", m.group("field")))
        elif m.group("param") is not None:
            out.append(("param", m.group("param")))
        elif m.group("score") is not None:
            out.append(("score", None))
        elif m.group("fn") is not None:
            out.append(("fn", m.group("fn")))
        else:
            out.append(("op", m.group("op")))
    return out


class Script:
    """A compiled script: one AST, two emitters (Column / SQL)."""

    def __init__(self, src: str, params: "dict | None" = None,
                 *, strict: bool = True):
        """``strict=False`` parses with unbound ``params.*`` left as
        placeholder nodes — the stored-script case, where parameters
        bind at USE time (emitting a Column/SQL with placeholders
        still unbound raises then)."""
        self.src = src
        self.params = {k: float(v) for k, v in (params or {}).items()}
        self.strict = strict
        self._toks = _lex(src)
        self._i = 0
        self.ast = self._expr()
        if self._i != len(self._toks):
            raise ValueError(f"trailing tokens in script: {src!r}")

    # -- recursive-descent parser ------------------------------------
    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else (None, None)

    def _next(self):
        t = self._peek()
        self._i += 1
        return t

    def _expect(self, op: str):
        kind, val = self._next()
        if kind != "op" or val != op:
            raise ValueError(f"expected {op!r} in script {self.src!r}")

    def _expr(self):
        node = self._term()
        while self._peek() == ("op", "+") or self._peek() == ("op", "-"):
            _, op = self._next()
            node = ("bin", op, node, self._term())
        return node

    def _term(self):
        node = self._unary()
        while self._peek() == ("op", "*") or self._peek() == ("op", "/"):
            _, op = self._next()
            node = ("bin", op, node, self._unary())
        return node

    def _unary(self):
        if self._peek() == ("op", "-"):
            self._next()
            return ("neg", self._unary())
        return self._primary()

    def _primary(self):
        kind, val = self._next()
        if kind == "num":
            return ("num", val)
        if kind == "field":
            return ("field", val)
        if kind == "param":
            if val not in self.params:
                if self.strict:
                    raise ValueError(
                        f"unbound params.{val} in script {self.src!r}"
                    )
                return ("param", val)
            return ("num", self.params[val])
        if kind == "score":
            return ("score", None)
        if kind == "fn":
            inner = self._expr()
            self._expect(")")
            return ("call", val, inner)
        if kind == "op" and val == "(":
            inner = self._expr()
            self._expect(")")
            return inner
        raise ValueError(f"unexpected token in script {self.src!r}")

    def bind(self, params: "dict | None" = None) -> "Script":
        """Bind (more) parameters and return a STRICT script — the
        stored-script use moment: ``GET _scripts/{id}`` source parsed
        once with ``strict=False``, then bound per request."""
        merged = dict(self.params)
        merged.update(params or {})
        return Script(self.src, merged)

    # -- emitters -----------------------------------------------------
    @property
    def fields(self) -> list[str]:
        out: list[str] = []

        def walk(n):
            if n[0] == "field" and n[1] not in out:
                out.append(n[1])
            elif n[0] == "bin":
                walk(n[2]), walk(n[3])
            elif n[0] in ("neg",):
                walk(n[1])
            elif n[0] == "call":
                walk(n[2])

        walk(self.ast)
        return out

    def column(self, *, score: "Column | None" = None) -> Column:
        """Emit the script as a native Column (doubles throughout;
        ``Math.floor`` re-cast to double so both emitters agree)."""

        def emit(n) -> Column:
            kind = n[0]
            if kind == "num":
                return F.lit(float(n[1]))
            if kind == "field":
                return F.col(n[1]).cast("double")
            if kind == "param":
                raise ValueError(
                    f"params.{n[1]} still unbound in script {self.src!r}"
                )
            if kind == "score":
                if score is None:
                    raise ValueError("_score used but no score column given")
                return score.cast("double")
            if kind == "neg":
                return -emit(n[1])
            if kind == "call":
                inner = emit(n[2])
                if n[1] == "floor":
                    return F.floor(inner).cast("double")
                return F.abs(inner)
            _, op, l, r = n
            a, b = emit(l), emit(r)
            return {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[op]

        return emit(self.ast)

    def sql(self, *, score_sql: "str | None" = None,
            field_map: "dict[str, str] | None" = None) -> str:
        """Emit the same AST as DuckDB SQL with identical operand
        order (every binop parenthesized; literals cast to DOUBLE so
        DuckDB does not run fixed-point DECIMAL arithmetic)."""
        fm = field_map or {}

        def emit(n) -> str:
            kind = n[0]
            if kind == "num":
                return f"CAST({n[1]!r} AS DOUBLE)"
            if kind == "field":
                return f"CAST({fm.get(n[1], n[1])} AS DOUBLE)"
            if kind == "param":
                raise ValueError(
                    f"params.{n[1]} still unbound in script {self.src!r}"
                )
            if kind == "score":
                if score_sql is None:
                    raise ValueError("_score used but no score_sql given")
                return f"CAST({score_sql} AS DOUBLE)"
            if kind == "neg":
                return f"(-{emit(n[1])})"
            if kind == "call":
                inner = emit(n[2])
                if n[1] == "floor":
                    return f"CAST(floor({inner}) AS DOUBLE)"
                return f"abs({inner})"
            _, op, l, r = n
            return f"({emit(l)} {op} {emit(r)})"

        return emit(self.ast)


# ---------------------------------------------------------------------------
# The three ES surfaces built on the compiler
# ---------------------------------------------------------------------------

def script_score(
    matched: DataFrame,
    script: str,
    params: "dict | None" = None,
    *,
    score: "Column | None" = None,
) -> Column:
    """ES ``script_score`` query: the scoring expression for an
    already-matched set (the query's filter context stays a pushed
    predicate; only the score is scripted).  Returns the score Column
    — the caller projects/orders it (TakeOrdered for the page)."""
    return Script(script, params).column(score=score)


def runtime_field(
    df: DataFrame, name: str, script: str, params: "dict | None" = None
) -> DataFrame:
    """ES runtime field (``runtime_mappings``): a computed column that
    exists only at query time — queries/aggs/sorts over it are plain
    expressions over the scan, so predicate pushdown and codegen treat
    it exactly like a stored column (no reindex, the ES pitch)."""
    return df.withColumn(name, Script(script, params).column())


def scripted_metric_agg(
    df: DataFrame,
    group_cols: "list[str]",
    map_script: str,
    params: "dict | None" = None,
    *,
    reduce: str = "sum",
    out: str = "value",
) -> DataFrame:
    """ES ``scripted_metric`` aggregation, restricted to the shape
    that distributes: ``map_script`` emits one value per doc and
    ``reduce`` combines them commutatively (``sum``/``min``/``max``/
    ``avg``) — i.e. init/combine/reduce are the standard monoid, which
    is the only scripted_metric form that is deterministic across
    shard orderings in ES itself.  Compiles to ONE hash aggregate
    (partial combine map-side), never a UDAF.

    Keep map values on an integer grid for cross-engine hash
    stability: sums of integral doubles are exact in any order."""
    mapped = Script(map_script, params).column()
    combines = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    if reduce == "avg":
        agg = (F.sum(mapped) / F.count(F.lit(1))).alias(out)
    elif reduce in combines:
        agg = combines[reduce](mapped).alias(out)
    else:
        raise ValueError("reduce must be one of sum/min/max/avg")
    return df.groupBy(*group_cols).agg(agg)
