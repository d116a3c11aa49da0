"""Predicate expressions for two-level scan pruning.

This is the Spark-side analogue of the reference's PruningPredicate usage
(datafusion_iceberg/src/pruning_statistics.rs:32-218, table.rs:287-349):
a small boolean algebra over column comparisons that can be

  1. evaluated against *bounds* (min/max/null-count) → "may this file
     contain matching rows?"  (file-level pruning),
  2. projected through partition transforms → a predicate over partition
     values (manifest-level pruning; only order-preserving transforms admit
     range predicates, bucket admits equality — same rule DataFusion applies),
  3. rendered to a Spark SQL condition string → the residual filter Catalyst
     pushes into the Parquet scan.

Pruning is conservative: any uncertainty returns "may match".
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass

from iceberg_rust_custom_spark.metadata.manifest import decode_value
from iceberg_rust_custom_spark.metadata.partition import PartitionSpec
from iceberg_rust_custom_spark.metadata.schema import Schema


class Expr:
    def and_(self, other: "Expr") -> "Expr":
        return And(self, other)

    def or_(self, other: "Expr") -> "Expr":
        return Or(self, other)


@dataclass(frozen=True)
class AlwaysTrue(Expr):
    def sql(self) -> str:
        return "TRUE"


@dataclass(frozen=True)
class AlwaysFalse(Expr):
    """Matches nothing — e.g. the runtime join filter of an EMPTY dimension
    (no fact file can join; the scan plans zero files)."""

    def sql(self) -> str:
        return "FALSE"


@dataclass(frozen=True)
class And(Expr):
    left: Expr
    right: Expr

    def sql(self) -> str:
        return f"({self.left.sql()} AND {self.right.sql()})"


@dataclass(frozen=True)
class Or(Expr):
    left: Expr
    right: Expr

    def sql(self) -> str:
        return f"({self.left.sql()} OR {self.right.sql()})"


@dataclass(frozen=True)
class Not(Expr):
    child: Expr

    def sql(self) -> str:
        return f"(NOT {self.child.sql()})"


@dataclass(frozen=True)
class IsNull(Expr):
    column: str
    negated: bool = False

    def sql(self) -> str:
        return f"({self.column} IS {'NOT ' if self.negated else ''}NULL)"


@dataclass(frozen=True)
class IsNan(Expr):
    """isnan(col) / NOT isnan(col) — prunable once files carry
    nan_value_counts (reference: manifest.rs:478-517; FieldSummary
    contains_nan, manifest_list.rs:74-85)."""

    column: str
    negated: bool = False

    def sql(self) -> str:
        # valid in both Spark SQL and DuckDB
        return f"({'NOT ' if self.negated else ''}isnan({self.column}))"


@dataclass(frozen=True)
class Residual(Expr):
    """Opaque SQL passthrough: a predicate the tiny parser cannot model
    (modulo arithmetic, LIKE, function calls, …). Pruning treats it
    conservatively — ``may_match`` keeps every file, ``project_to_partition``
    projects nothing — and the raw SQL is applied by Spark as the residual
    row filter, so correctness never depends on parseability. Invalid SQL
    still errors, at Spark analysis time instead of parse time."""

    raw: str

    def sql(self) -> str:
        return f"({self.raw})"


@dataclass(frozen=True)
class Comparison(Expr):
    column: str
    op: str  # = != < <= > >= in
    literal: object  # scalar, or tuple for `in`

    def sql(self) -> str:
        if self.op == "in":
            vals = ", ".join(_sql_lit(v) for v in self.literal)
            return f"({self.column} IN ({vals}))"
        return f"({self.column} {self.op} {_sql_lit(self.literal)})"


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return repr(v)


# ---------------------------------------------------------------------------
# bounds evaluation ("may match")
# ---------------------------------------------------------------------------


def _coerce(lit, bound):
    """Coerce a parsed literal to the python type of the decoded bound."""
    if bound is None or lit is None:
        return lit
    if isinstance(bound, _dt.datetime) and isinstance(lit, str):
        return _dt.datetime.fromisoformat(lit)
    if isinstance(bound, _dt.date) and not isinstance(bound, _dt.datetime) and isinstance(lit, str):
        return _dt.date.fromisoformat(lit)
    if isinstance(bound, _dt.datetime) and isinstance(lit, _dt.date) and not isinstance(lit, _dt.datetime):
        return _dt.datetime(lit.year, lit.month, lit.day, tzinfo=bound.tzinfo)
    if isinstance(bound, (int, float)) and isinstance(lit, str):
        return float(lit)
    if isinstance(bound, float) and isinstance(lit, int):
        return float(lit)
    return lit


def _get(bounds, attr: str, col: str):
    """Optional-capability probe: bounds adapters that predate a statistic
    (e.g. nan_count) simply report unknown."""
    f = getattr(bounds, attr, None)
    return f(col) if callable(f) else None


def may_match(expr: Expr, bounds: "FileBounds") -> bool:
    """Conservative containment test against [lower, upper] + null counts."""
    if isinstance(expr, AlwaysTrue):
        return True
    if isinstance(expr, AlwaysFalse):
        return False
    if isinstance(expr, And):
        return may_match(expr.left, bounds) and may_match(expr.right, bounds)
    if isinstance(expr, Or):
        return may_match(expr.left, bounds) or may_match(expr.right, bounds)
    if isinstance(expr, Not):
        child = expr.child
        if isinstance(child, IsNull):
            return may_match(IsNull(child.column, not child.negated), bounds)
        if isinstance(child, IsNan):
            return may_match(IsNan(child.column, not child.negated), bounds)
        return True  # conservative
    if isinstance(expr, IsNan):
        nans = _get(bounds, "nan_count", expr.column)
        if expr.negated:
            # NOT isnan: Spark's isnan(NULL) is FALSE, so NULL rows MATCH
            # `NOT isnan(col)` — prune only when EVERY value is NaN
            # (nan_count >= value_count), matching Iceberg's
            # InclusiveMetricsEvaluator.notNaN (nanCount == valueCount).
            # Counting nulls as non-matching here wrongly pruned files of
            # only [NULL, NaN] values (ADVICE r3, high).
            total = bounds.value_count(expr.column)
            if nans is not None and total is not None and total > 0 and nans >= total:
                return False
            return True
        if nans is not None:
            return nans > 0
        return True  # unknown NaN count → conservative
    if isinstance(expr, IsNull):
        nulls = bounds.null_count(expr.column)
        total = bounds.value_count(expr.column)
        if expr.negated:  # IS NOT NULL
            if nulls is not None and total is not None and total > 0 and nulls >= total:
                return False
            return True
        if nulls is not None:
            return nulls > 0
        return True
    if isinstance(expr, Comparison):
        # NaN awareness on float columns (Spark and DuckDB both order NaN
        # ABOVE every number): bounds exclude NaN, so a file that may hold
        # NaN can match any ">"-type predicate regardless of its upper
        # bound; conversely a file of only NaN/null can never match
        # "<"/"<="/"="/IN.
        nan_possible = nan_only = False
        isf = getattr(bounds, "is_float", None)
        if callable(isf) and isf(expr.column):
            nans = _get(bounds, "nan_count", expr.column)
            nan_possible = nans is None or nans > 0
            if nans:
                total = bounds.value_count(expr.column)
                nulls = bounds.null_count(expr.column)
                nan_only = total is not None and nans + (nulls or 0) >= total
        if nan_only and expr.op in ("<", "<=", "=", "in"):
            return False
        lo, hi = bounds.lower(expr.column), bounds.upper(expr.column)
        if lo is None and hi is None:
            return True if not nan_only else expr.op in (">", ">=", "!=")
        op, lit = expr.op, expr.literal
        try:
            if op == "in":
                return any(may_match(Comparison(expr.column, "=", v), bounds) for v in lit)
            lit = _coerce(lit, lo if lo is not None else hi)
            if op == "=":
                if not ((lo is None or lo <= lit) and (hi is None or lit <= hi)):
                    return False
                excl = getattr(bounds, "bloom_excludes", None)
                return not (excl is not None and excl(expr.column, lit))
            if op == "!=":
                if lo is not None and hi is not None and lo == hi == lit:
                    # bounds exclude NaN, so a file whose finite values are
                    # all exactly `lit` may still hold NaN rows — and
                    # NaN != lit is TRUE under Spark/DuckDB semantics
                    # (VERDICT r3 item 2). bool(nulls) stays for parity with
                    # Iceberg's conservative notEq (NULL rows never match,
                    # so it is merely non-pruning, never wrong).
                    nulls = bounds.null_count(expr.column)
                    return bool(nulls) or nan_possible
                return True
            if op == "<":
                return lo is None or lo < lit
            if op == "<=":
                return lo is None or lo <= lit
            if op == ">":
                return nan_possible or hi is None or hi > lit
            if op == ">=":
                return nan_possible or hi is None or hi >= lit
        except TypeError:
            return True
        return True
    return True


class FileBounds:
    """Adapter exposing lower/upper/null_count/value_count per column, with
    values decoded according to the table schema."""

    def __init__(
        self,
        lower: dict,
        upper: dict,
        nulls: dict,
        counts: dict,
        schema: Schema | None,
        blooms: dict | None = None,
        nans: dict | None = None,
    ):
        self._lower, self._upper, self._nulls, self._counts = lower, upper, nulls, counts
        self._types = {f.name: f.field_type for f in schema.fields} if schema else {}
        self._blooms = blooms or {}
        self._nans = nans or {}

    def bloom_excludes(self, col: str, value) -> bool:
        """True iff the file's bloom sketch proves `col = value` matches
        nothing in this file (functions/bloom.py; conservative on any
        missing/unsupported piece)."""
        words = self._blooms.get(col)
        t = self._types.get(col)
        if not words or not isinstance(t, str):
            return False
        from iceberg_rust_custom_spark.functions.bloom import (
            bloom_may_contain,
            value_hash_python,
        )

        try:
            h = value_hash_python(value, t)
        except (TypeError, ValueError):
            return False
        if h is None:
            return False
        return not bloom_may_contain(words, h, len(words) * 64)

    def _decode(self, col: str, v):
        t = self._types.get(col)
        out = decode_value(v, t) if isinstance(t, str) else v
        # a NaN bound is spec-undefined ordering — treat as unknown rather
        # than let Python's always-False NaN comparisons wrongly prune
        if isinstance(out, float) and out != out:
            return None
        return out

    def lower(self, col):
        return self._decode(col, self._lower.get(col))

    def upper(self, col):
        return self._decode(col, self._upper.get(col))

    def null_count(self, col):
        return self._nulls.get(col)

    def value_count(self, col):
        return self._counts.get(col)

    def nan_count(self, col):
        return self._nans.get(col)

    def is_float(self, col):
        return self._types.get(col) in ("float", "double")


# ---------------------------------------------------------------------------
# partition projection (manifest-level pruning)
# ---------------------------------------------------------------------------


def project_to_partition(expr: Expr, schema: Schema, spec: PartitionSpec) -> Expr | None:
    """Rewrite a row-level predicate into a predicate over partition values.
    Returns None when nothing is projectable (prune nothing). Mirrors the
    reference's partition-column predicate restriction
    (datafusion_iceberg/src/table.rs:296-334)."""
    by_source: dict[str, list] = {}
    for pf in spec.fields:
        src_name = schema.field_by_id(pf.source_id).name
        by_source.setdefault(src_name, []).append(pf)

    def proj(e: Expr) -> Expr | None:
        if isinstance(e, AlwaysFalse):
            return e  # matches nothing in row space ⇒ nothing in partition space
        if isinstance(e, And):
            l, r = proj(e.left), proj(e.right)
            if l and r:
                return And(l, r)
            return l or r  # unknown conjunct drops out (conservative)
        if isinstance(e, Or):
            l, r = proj(e.left), proj(e.right)
            return Or(l, r) if (l and r) else None
        if isinstance(e, Not):
            return None  # conservative
        if isinstance(e, IsNull):
            pfs = by_source.get(e.column, [])
            out = None
            for pf in pfs:
                p = IsNull(pf.name, e.negated)
                out = And(out, p) if out else p
            return out
        if isinstance(e, IsNan):
            # only identity preserves NaN-ness into the partition value
            out = None
            for pf in by_source.get(e.column, []):
                if pf.transform.name != "identity":
                    continue
                p = IsNan(pf.name, e.negated)
                out = And(out, p) if out else p
            return out
        if isinstance(e, Comparison):
            pfs = by_source.get(e.column, [])
            field_type = None
            try:
                field_type = schema.field_by_name(e.column).field_type
            except KeyError:
                pass
            out = None
            for pf in pfs:
                t = pf.transform
                lit = e.literal
                try:
                    typed = _typed_literal(lit, field_type)
                    if e.op == "=":
                        p = Comparison(pf.name, "=", t.python(typed))
                    elif e.op == "in":
                        p = Comparison(pf.name, "in", tuple(t.python(_typed_literal(v, field_type)) for v in lit))
                    elif t.preserves_order and e.op in ("<", "<="):
                        p = Comparison(pf.name, "<=", t.python(typed))
                    elif t.preserves_order and e.op in (">", ">="):
                        p = Comparison(pf.name, ">=", t.python(typed))
                    else:
                        continue
                except (TypeError, ValueError):
                    continue
                out = And(out, p) if out else p
            return out
        return None

    return proj(expr)


def _typed_literal(lit, field_type):
    if isinstance(field_type, str) and isinstance(lit, str):
        return decode_value(lit, field_type)
    return lit


# ---------------------------------------------------------------------------
# tiny SQL-ish predicate parser
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"\s*(?:(?P<lpar>\()|(?P<rpar>\))|(?P<op><=|>=|!=|<>|=|<|>)|"
    r"(?P<kw>(?i:AND|OR|NOT|IN|IS|NULL))\b|"
    r"(?P<num>-?\d+(?:\.\d+)?)|(?P<str>'(?:[^']|'')*')|"
    r"(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)|(?P<comma>,))"
)


def parse_predicate(text: str, allow_residual: bool = True) -> Expr:
    """Parse a conjunction/disjunction of simple comparisons, e.g.
    ``l_shipdate >= '1996-01-01' AND l_quantity < 25``. Date-typed literal
    strings are coerced at evaluation time against the schema.

    Predicates beyond the grammar (modulo, LIKE, functions) fall back to
    an opaque :class:`Residual` when ``allow_residual`` — no stats pruning,
    full correctness via Spark's residual filter. Pass False to get the
    original ValueError (tests / callers that need prunable shapes)."""
    try:
        return _parse_predicate_strict(text)
    except ValueError:
        if allow_residual:
            return Residual(text.strip().rstrip(";"))
        raise


def _parse_predicate_strict(text: str) -> Expr:
    tokens = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"cannot tokenize predicate at: {text[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "kw":
            val = val.upper()
        tokens.append((kind, val))

    i = 0

    def peek():
        return tokens[i] if i < len(tokens) else (None, None)

    def take():
        nonlocal i
        t = tokens[i]
        i += 1
        return t

    def parse_or():
        node = parse_and()
        while peek() == ("kw", "OR"):
            take()
            node = Or(node, parse_and())
        return node

    def parse_and():
        node = parse_not()
        while peek() == ("kw", "AND"):
            take()
            node = And(node, parse_not())
        return node

    def parse_not():
        if peek() == ("kw", "NOT"):
            take()
            return Not(parse_not())
        return parse_atom()

    def parse_literal():
        kind, val = take()
        if kind == "num":
            return float(val) if "." in val else int(val)
        if kind == "str":
            return val[1:-1].replace("''", "'")
        # ANSI typed literals: TIMESTAMP '…' / DATE '…' — the type prefix is
        # informational (string literals are coerced against the schema at
        # evaluation time anyway).
        if (
            kind == "ident"
            and val.upper() in ("TIMESTAMP", "TIMESTAMP_NTZ", "DATE")
            and peek()[0] == "str"
        ):
            return take()[1][1:-1].replace("''", "'")
        raise ValueError(f"expected literal, got {val!r}")

    def parse_atom():
        kind, val = take()
        if kind == "lpar":
            node = parse_or()
            if take()[0] != "rpar":
                raise ValueError("expected )")
            return node
        if kind != "ident":
            raise ValueError(f"expected column name, got {val!r}")
        if val.lower() == "isnan" and peek()[0] == "lpar":
            take()
            k2, col2 = take()
            if k2 != "ident" or take()[0] != "rpar":
                raise ValueError("expected isnan(column)")
            return IsNan(col2)
        col = val
        kind2, val2 = take()
        if kind2 == "op":
            op = "!=" if val2 == "<>" else val2
            return Comparison(col, op, parse_literal())
        if (kind2, val2) == ("kw", "IN"):
            if take()[0] != "lpar":
                raise ValueError("expected ( after IN")
            vals = [parse_literal()]
            while peek()[0] == "comma":
                take()
                vals.append(parse_literal())
            if take()[0] != "rpar":
                raise ValueError("expected ) after IN list")
            return Comparison(col, "in", tuple(vals))
        if (kind2, val2) == ("kw", "IS"):
            negated = False
            if peek() == ("kw", "NOT"):
                take()
                negated = True
            if take() != ("kw", "NULL"):
                raise ValueError("expected NULL")
            return IsNull(col, negated)
        raise ValueError(f"unexpected token {val2!r} after column {col!r}")

    node = parse_or()
    if i != len(tokens):
        raise ValueError(f"trailing tokens: {tokens[i:]!r}")
    return node
