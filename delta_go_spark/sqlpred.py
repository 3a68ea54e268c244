"""Parse a SQL WHERE predicate into the engine's Expression AST.

The AST (expressions.py) is what DML and scans prune files with, so SQL
text routed through this parser gets partition pruning and stats skipping
exactly like the Python API — `DELETE FROM t WHERE p = 'x'` touches only
p=x files.  Grammar (case-insensitive keywords):

    expr    := or
    or      := and (OR and)*
    and     := unary (AND unary)*
    unary   := NOT unary | primary
    primary := '(' expr ')'
             | col IS [NOT] NULL
             | col [NOT] IN '(' literal (',' literal)* ')'
             | col [NOT] LIKE 'pattern'
             | col (= | == | != | <> | < | <= | > | >=) literal

Literals are typed by the referenced column's declared type via the same
partition-value parsing rules the scanner uses, so comparisons agree with
file-skipping semantics.
"""

from __future__ import annotations

import re

from pyspark.sql.types import StructType

from delta_go_spark.expressions import (
    And,
    Column,
    EqualTo,
    Expression,
    GreaterThan,
    GreaterThanOrEq,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEq,
    Like,
    Literal,
    Not,
    Or,
    parse_partition_value,
)

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+(?:\.\d+)?)
      | '(?P<str>(?:[^']|'')*)'
      | (?P<op><=|>=|==|!=|<>|=|<|>)
      | (?P<lp>\()
      | (?P<rp>\))
      | (?P<comma>,)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "is", "null", "like", "true", "false"}


class PredicateParseError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            if text[pos:].strip():
                raise PredicateParseError(
                    f"unexpected character at {pos}: {text[pos:pos + 20]!r}"
                )
            break
        pos = m.end()
        for kind in ("num", "str", "op", "lp", "rp", "comma", "word"):
            v = m.group(kind)
            if v is not None:
                if kind == "word" and v.lower() in _KEYWORDS:
                    out.append((v.lower(), v))
                else:
                    out.append((kind, v))
                break
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], schema: StructType):
        self.toks = tokens
        self.i = 0
        self.fields = {f.name.lower(): f for f in schema.fields}

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise PredicateParseError("unexpected end of predicate")
        self.i += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise PredicateParseError(f"expected {kind}, got {v!r}")
        return v

    # -- grammar -----------------------------------------------------------
    def parse(self) -> Expression:
        e = self.or_expr()
        if self.peek() is not None:
            raise PredicateParseError(
                f"trailing tokens from {self.peek()[1]!r}"
            )
        return e

    def or_expr(self) -> Expression:
        e = self.and_expr()
        while self.peek() and self.peek()[0] == "or":
            self.next()
            e = Or(e, self.and_expr())
        return e

    def and_expr(self) -> Expression:
        e = self.unary()
        while self.peek() and self.peek()[0] == "and":
            self.next()
            e = And(e, self.unary())
        return e

    def unary(self) -> Expression:
        if self.peek() and self.peek()[0] == "not":
            self.next()
            return Not(self.unary())
        return self.primary()

    def _column(self, name: str) -> Column:
        f = self.fields.get(name.lower())
        if f is None:
            raise PredicateParseError(f"unknown column: {name}")
        return Column(f.name, f.dataType)

    def _literal(self, col: Column) -> Literal:
        k, v = self.next()
        if k == "null":
            return Literal(None, col.dtype)
        if k in ("true", "false"):
            # boolean literals only type against boolean columns — typing
            # them through a string/numeric column would build an ill-typed
            # comparison that crashes mid-prune instead of at parse time
            from pyspark.sql.types import BooleanType

            if not isinstance(col.dtype, BooleanType):
                raise PredicateParseError(
                    f"boolean literal {k} against non-boolean column {col.name}"
                )
            return Literal(k == "true", col.dtype)
        if k == "str":
            raw = v.replace("''", "'")
        elif k == "num":
            raw = v
        else:
            raise PredicateParseError(f"expected literal, got {v!r}")
        # type through the column's declared dtype — the same parsing the
        # partition-pruning evaluator applies to partitionValues strings
        return Literal(parse_partition_value(raw, col.dtype), col.dtype)

    def primary(self) -> Expression:
        k, v = self.next()
        if k == "lp":
            e = self.or_expr()
            self.expect("rp")
            return e
        if k != "word":
            raise PredicateParseError(f"expected column name, got {v!r}")
        col = self._column(v)

        k2, v2 = self.next()
        negate = False
        if k2 == "not":
            negate = True
            k2, v2 = self.next()
        if k2 == "is":
            if negate:
                # 'col NOT IS NULL' is not SQL; silently dropping the NOT
                # would invert the meaning — reject it
                raise PredicateParseError(
                    "use 'IS NOT NULL', not 'NOT IS NULL'"
                )
            if self.peek() and self.peek()[0] == "not":
                self.next()
                self.expect("null")
                return IsNotNull(col)
            self.expect("null")
            return IsNull(col)
        if k2 == "in":
            self.expect("lp")
            vals = [self._literal(col)]
            while self.peek() and self.peek()[0] == "comma":
                self.next()
                vals.append(self._literal(col))
            self.expect("rp")
            e: Expression = In(col, tuple(vals))
            return Not(e) if negate else e
        if k2 == "like":
            lit = self._literal(col)
            if lit.value is None:
                raise PredicateParseError(
                    "LIKE NULL matches nothing in SQL; write an explicit "
                    "pattern (str(None) would silently match 'None')"
                )
            e = Like(col, str(lit.value))
            return Not(e) if negate else e
        if negate:
            raise PredicateParseError(f"NOT must precede IN/LIKE, got {v2!r}")
        if k2 != "op":
            raise PredicateParseError(f"expected operator, got {v2!r}")
        lit = self._literal(col)
        ops = {
            "=": EqualTo,
            "==": EqualTo,
            "<": LessThan,
            "<=": LessThanOrEq,
            ">": GreaterThan,
            ">=": GreaterThanOrEq,
        }
        if v2 in ops:
            return ops[v2](col, lit)
        if v2 in ("!=", "<>"):
            return Not(EqualTo(col, lit))
        raise PredicateParseError(f"unsupported operator: {v2}")


def parse_predicate(text: str, schema: StructType) -> Expression:
    """SQL WHERE text -> engine Expression, typed against `schema`."""
    return _Parser(_tokenize(text), schema).parse()


def parse_literal(text: str, column: str, schema: StructType) -> Literal:
    """A single SQL literal (number / 'string' / NULL / TRUE / FALSE),
    typed against `column`'s declared type — the SET-clause rhs parser."""
    p = _Parser(_tokenize(text), schema)
    lit = p._literal(p._column(column))
    if p.peek() is not None:
        raise PredicateParseError(
            f"SET value must be a single literal, got trailing {p.peek()[1]!r}"
        )
    return lit


def split_where(text: str) -> tuple[str, str | None]:
    """Split `text` at the first top-level (outside single quotes) WHERE
    keyword; returns (head, where_clause|None).  Regex splitting would cut
    inside a string literal containing the word where."""
    low = text.lower()
    in_str = False
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str and low.startswith("where", i):
            before_ok = i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")
            after = i + 5
            after_ok = after >= len(text) or not (
                text[after].isalnum() or text[after] == "_"
            )
            if before_ok and after_ok:
                return text[:i].strip(), text[after:].strip()
        i += 1
    return text.strip(), None
