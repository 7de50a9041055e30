"""Expression filter layer: a typed AST compiled to
``pyarrow.compute`` / ``pyarrow.dataset`` expressions, applied with
zero-copy batch filters.

Capability parity with the reference's expression surface
(``core/store/.../query/filter/expression/`` — And/Or/Not/Between/
IsNull/comparisons; ``expression/numeric/`` Add/Subtract/Multiply/
Divide/Abs; ``expression/text/`` Concat/Contains/StartsWith/EndsWith
with case-insensitivity; temporal Before/After/During) — built as a
small Python builder API instead of CQL/ANTLR parsing.

Usage::

    from geowave_ray.expr import col, lit
    e = (col("lang") == "en") & col("n_chars").between(500, 2000)
    ds = ds.map_batches(e.filter_batch, batch_format="pyarrow")
    # or push straight into the parquet scan:
    ray.data.read_parquet(path, filter=e.to_arrow())
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


class Expr:
    """Wraps a function batch -> pyarrow Array plus (when possible) a
    pyarrow.dataset.Expression for scan push-down."""

    def __init__(self, fn, ds_expr: pads.Expression | None = None):
        self._fn = fn
        self._ds_expr = ds_expr

    # --- evaluation -----------------------------------------------------
    def evaluate(self, batch: pa.Table):
        return self._fn(batch)

    def filter_batch(self, batch: pa.Table) -> pa.Table:
        return batch.filter(self.evaluate(batch))

    def to_arrow(self) -> pads.Expression:
        if self._ds_expr is None:
            raise ValueError("expression not push-down capable")
        return self._ds_expr

    # --- combinators ----------------------------------------------------
    def _bin(self, other: Any, kernel, ds_op):
        o = other if isinstance(other, Expr) else lit(other)
        ds_expr = None
        if self._ds_expr is not None and o._ds_expr is not None:
            try:
                ds_expr = ds_op(self._ds_expr, o._ds_expr)
            except Exception:
                ds_expr = None
        return Expr(lambda b: kernel(self.evaluate(b), o.evaluate(b)), ds_expr)

    def __eq__(self, other):  # noqa: D105
        return self._bin(other, pc.equal, lambda a, b: a == b)

    def __ne__(self, other):  # noqa: D105
        return self._bin(other, pc.not_equal, lambda a, b: a != b)

    def __lt__(self, other):
        return self._bin(other, pc.less, lambda a, b: a < b)

    def __le__(self, other):
        return self._bin(other, pc.less_equal, lambda a, b: a <= b)

    def __gt__(self, other):
        return self._bin(other, pc.greater, lambda a, b: a > b)

    def __ge__(self, other):
        return self._bin(other, pc.greater_equal, lambda a, b: a >= b)

    def __and__(self, other):
        return self._bin(other, pc.and_kleene, lambda a, b: a & b)

    def __or__(self, other):
        return self._bin(other, pc.or_kleene, lambda a, b: a | b)

    def __invert__(self):
        ds_expr = ~self._ds_expr if self._ds_expr is not None else None
        return Expr(lambda b: pc.invert(self.evaluate(b)), ds_expr)

    # arithmetic (expression/numeric/)
    def __add__(self, other):
        return self._bin(other, pc.add, lambda a, b: a + b)

    def __sub__(self, other):
        return self._bin(other, pc.subtract, lambda a, b: a - b)

    def __mul__(self, other):
        return self._bin(other, pc.multiply, lambda a, b: a * b)

    def __truediv__(self, other):
        return self._bin(other, pc.divide, lambda a, b: a / b)

    def abs(self):
        return Expr(lambda b: pc.abs(self.evaluate(b)))

    # predicates
    def between(self, lo, hi):
        """lo <= x <= hi (inclusive — GenericBetween semantics)."""
        return (self >= lo) & (self <= hi)

    def is_null(self):
        return Expr(lambda b: pc.is_null(self.evaluate(b)),
                    self._ds_expr.is_null() if self._ds_expr is not None else None)

    def is_not_null(self):
        return ~self.is_null()

    def isin(self, values):
        ds_expr = self._ds_expr.isin(values) if self._ds_expr is not None else None
        return Expr(lambda b: pc.is_in(self.evaluate(b), value_set=pa.array(values)), ds_expr)

    # text (expression/text/)
    def contains(self, sub: str, ignore_case: bool = False):
        return Expr(lambda b: pc.match_substring(self.evaluate(b), sub, ignore_case=ignore_case))

    def starts_with(self, pre: str, ignore_case: bool = False):
        return Expr(lambda b: pc.starts_with(self.evaluate(b), pre, ignore_case=ignore_case))

    def ends_with(self, suf: str, ignore_case: bool = False):
        return Expr(lambda b: pc.ends_with(self.evaluate(b), suf, ignore_case=ignore_case))

    def concat(self, other):
        o = other if isinstance(other, Expr) else lit(other)
        return Expr(lambda b: pc.binary_join_element_wise(self.evaluate(b), o.evaluate(b), ""))

    def cast(self, typ: pa.DataType):
        """Type cast (the reference's CastableType registry —
        ``query/gwql/castable/`` + geotime Date/Geometry castables)."""
        ds_expr = None
        if self._ds_expr is not None:
            try:
                ds_expr = self._ds_expr.cast(typ)
            except Exception:
                ds_expr = None
        return Expr(lambda b: pc.cast(self.evaluate(b), typ), ds_expr)


def col(name: str) -> Expr:
    return Expr(lambda b: b.column(name), pads.field(name))


def lit(value: Any) -> Expr:
    return Expr(lambda b: pa.scalar(value), pads.scalar(value))
