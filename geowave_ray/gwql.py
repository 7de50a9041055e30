"""GWQL-style mini query language.

The reference defines GWQL, an ANTLR SQL dialect
(``core/store/src/main/antlr4/.../GWQL.g4``,
``query/gwql/statement/SelectStatement.java``):

    SELECT sel[, sel...] FROM type [WHERE filter] [LIMIT n]

with aggregate functions COUNT/MIN/MAX/SUM and BBOX, scalar functions
ABS/CONCAT, text predicates strStartsWith/strEndsWith/contains, and
comparison/boolean operators. This module is a small recursive-descent
parser (no ANTLR here) producing a plan over a ``ray.data.Dataset``
via the expression layer (:mod:`geowave_ray.expr`).

Supported grammar (round 1):

    SELECT *| col[, col...] | AGG(col)[, AGG(col)...]
    FROM name
    [WHERE predicate]
    [ORDER BY col [DESC][, ...]]          -- =, <>, <, <=, >, >=, AND, OR, NOT,
                               -- BETWEEN x AND y, IN (v, ...),
                               -- CONTAINS(col,'s'), STRSTARTSWITH,
                               -- STRENDSWITH, IS [NOT] NULL
    [LIMIT n]

Aggregates: COUNT(*), COUNT(col), MIN(col), MAX(col), SUM(col).

Round 4 adds the GWQLSpatialTemporalExtensions surface
(``core/geotime/.../gwql/GWQLSpatialTemporalExtensions.java:27-77``):
spatial predicate functions BBOX/BBOXLOOSE (optional trailing CRS
literal, envelope reprojected by edge sampling), INTERSECTS/
INTERSECTSLOOSE/DISJOINT/DISJOINTLOOSE/WITHIN/TOUCHES/CROSSES/OVERLAPS
over WKT or CAST(... AS GEOMETRY) literals, temporal predicate
functions TCONTAINS/TOVERLAPS, and the temporal infix operators
BEFORE / BEFORE_OR_DURING / DURING / DURING_OR_AFTER / AFTER with
'instant' and 'start/end' time literals (``TemporalOperators.java``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .expr import Expr, col, lit

_TOKEN = re.compile(
    r"\s*(?:(?P<num>-?\d+(?:\.\d+)?)|(?P<str>'(?:[^']|'')*')|"
    r"(?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\*)|(?P<word>[A-Za-z_][A-Za-z_0-9.]*))"
)

_KEYWORDS = {
    "SELECT", "FROM", "WHERE", "LIMIT", "AND", "OR", "NOT", "BETWEEN",
    "IN", "IS", "NULL", "LIKE", "AS", "ORDER", "BY", "DESC", "ASC",
    "GROUP", "CAST",
}
_AGGS = {"COUNT", "MIN", "MAX", "SUM", "BBOX"}
_FUNCS = {"CONTAINS", "STRSTARTSWITH", "STRENDSWITH", "ABS", "CONCAT", "PIP"}
_SCALAR_FUNCS = (
    "ABS", "CONCAT", "AREA", "GEOMLENGTH", "CENTROIDX", "CENTROIDY",
    # round-5 tier-2 catalog: geometry structure, transcendental math,
    # date formatting — kernels shared with the CQL function library
    "NUMPOINTS", "NUMGEOMETRIES", "GEOMETRYTYPE",
    "EXP", "LOG", "POW", "SQRT", "SIN", "COS", "TAN",
    "ASIN", "ACOS", "ATAN", "ATAN2", "TODEGREES", "TORADIANS",
    "DATEFORMAT", "STRLENGTH",
)
# GWQLSpatialTemporalExtensions.java:27-77 — spatial predicate
# functions, temporal predicate functions, temporal infix operators
_SPATIAL_PREDS = {
    "BBOX", "BBOXLOOSE", "INTERSECTS", "INTERSECTSLOOSE", "DISJOINT",
    "DISJOINTLOOSE", "CROSSES", "OVERLAPS", "TOUCHES", "WITHIN",
}
_TEMPORAL_PREDS = {"TCONTAINS", "TOVERLAPS"}
_TEMPORAL_OPS = {
    "BEFORE", "AFTER", "DURING", "BEFORE_OR_DURING", "DURING_OR_AFTER",
}
_CAST_TYPES = {"DATE", "TIMESTAMP", "BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "GEOMETRY"}


def parse_wkt_polygon(wkt: str):
    """Minimal WKT POLYGON((x y, ...)) -> (N,2) ring (exterior only) —
    the GeometryCastableType role
    (``core/geotime/.../gwql/GeometryCastableType.java``)."""
    import numpy as np

    m = re.match(r"\s*POLYGON\s*\(\s*\((.*?)\)", wkt, re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError(f"GWQL: cannot parse WKT {wkt[:40]!r}")
    pts = []
    for pair in m.group(1).split(","):
        x, y = pair.split()
        pts.append((float(x), float(y)))
    return np.asarray(pts, dtype=np.float64)


def tokenize(s: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"GWQL: cannot tokenize at: {s[pos:pos+20]!r}")
        pos = m.end()
        if m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("op") is not None:
            out.append(("op", m.group("op")))
        else:
            w = m.group("word")
            out.append(("kw" if w.upper() in _KEYWORDS else "word", w))
    return out


def _eval_scalar(a, b):
    """Evaluate a scalar node against an Arrow batch: ("call", F,
    args) recurses through the shared CQL kernel catalog; ("word", c)
    is a column; anything else is a literal."""
    if a[0] == "call":
        _, fn, args = a
        from .cql import _CQL_FUNCS

        arity, kern = _CQL_FUNCS[fn.lower()]
        if len(args) != arity:
            raise ValueError(
                f"GWQL: {fn} takes {arity} argument(s), got {len(args)}"
            )
        return kern(*[_eval_scalar(x, b) for x in args])
    ta, va = a
    if ta == "word":
        return b.column(va)
    if ta == "num":
        return pa.scalar(float(va) if "." in va else int(va))
    return pa.scalar(va)


@dataclass
class Select:
    columns: list  # list[str] or [("agg", fn, col, alias)]
    table: str
    where: Expr | None
    limit: int | None
    is_agg: bool = False
    order_by: list | None = None  # [(col, descending)]
    is_delete: bool = False
    group_by: list | None = None  # [col, ...]


class _Parser:
    def __init__(self, tokens, geom: tuple[str, str] = ("lon", "lat")):
        self.toks = tokens
        self.i = 0
        # point-adapter geometry binding: any geometry identifier in a
        # spatial predicate resolves to these (lon, lat) columns
        self.geom = geom

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect_kw(self, kw):
        t, v = self.next()
        if v is None or v.upper() != kw:
            raise ValueError(f"GWQL: expected {kw}, got {v!r}")

    def _func_args(self):
        """Argument list of a select-list scalar function, after the
        opening paren: columns, literals, or NESTED scalar calls
        (``EXP(TORADIANS(value))``) as ("call", FNAME, args) nodes."""
        args = []
        while True:
            ta, va = self.next()
            if (
                ta == "word"
                and va.upper() in _SCALAR_FUNCS
                and self.peek() == ("op", "(")
            ):
                self.next()  # (
                args.append(("call", va.upper(), self._func_args()))
            else:
                args.append((ta, va))
            tn, vn = self.next()
            if tn == "op" and vn == ",":
                continue
            if tn == "op" and vn == ")":
                return args
            raise ValueError("GWQL: expected , or ) in function args")

    # --- select list --------------------------------------------------
    def parse(self) -> Select:
        self.expect_kw("SELECT")
        cols_out, is_agg = self._select_list()
        self.expect_kw("FROM")
        _, table = self.next()
        where = None
        limit = None
        order_by = None
        group_by = None
        t, v = self.peek()
        if v and v.upper() == "WHERE":
            self.next()
            where = self._or_expr()
            t, v = self.peek()
        if v and v.upper() == "GROUP":
            self.next()
            self.expect_kw("BY")
            group_by = []
            while True:
                _, g = self.next()
                group_by.append(g)
                if self.peek() == ("op", ","):
                    self.next()
                    continue
                break
            t, v = self.peek()
        if v and v.upper() == "ORDER":
            self.next()
            self.expect_kw("BY")
            order_by = []
            while True:
                _, cname = self.next()
                desc = False
                t2, v2 = self.peek()
                if v2 and v2.upper() in ("DESC", "ASC"):
                    self.next()
                    desc = v2.upper() == "DESC"
                order_by.append((cname, desc))
                if self.peek() == ("op", ","):
                    self.next()
                    continue
                break
            t, v = self.peek()
        if v and v.upper() == "LIMIT":
            self.next()
            _, n = self.next()
            limit = int(n)
        return Select(cols_out, table, where, limit, is_agg, order_by, group_by=group_by)

    def _select_list(self):
        cols_out = []
        is_agg = False
        while True:
            t, v = self.next()
            if t == "op" and v == "*":
                cols_out.append("*")
            elif t == "kw" and v.upper() == "CAST" and self.peek() == ("op", "("):
                self.next()  # (
                _, cname = self.next()
                self.expect_kw("AS")
                _, typ = self.next()
                tc, vc = self.next()
                if not (tc == "op" and vc == ")"):
                    raise ValueError("GWQL: expected )")
                alias = cname
                t3, v3 = self.peek()
                if v3 and v3.upper() == "AS":
                    self.next()
                    _, alias = self.next()
                if typ.upper() not in _CAST_TYPES:
                    raise ValueError(f"GWQL: unknown cast type {typ}")
                cols_out.append(("cast", cname, typ.upper(), alias))
            elif t == "word" and v.upper() in _SCALAR_FUNCS and self.peek() == (
                "op",
                "(",
            ):
                # scalar functions in the select list (Abs.java /
                # Concat.java under core/store/.../gwql/function/, plus
                # the geometry measures the reference exposes through
                # its Spark GeomFunction UDFs — AREA / GEOMLENGTH /
                # CENTROIDX / CENTROIDY over a WKB column, kernels
                # shared with the CQL filter-function library)
                self.next()  # (
                args = self._func_args()
                alias = v.lower()
                t3, v3 = self.peek()
                if v3 and v3.upper() == "AS":
                    self.next()
                    _, alias = self.next()
                cols_out.append(("func", v.upper(), args, alias))
            elif t == "word" and v.upper() in _AGGS and self.peek() == ("op", "("):
                self.next()  # (
                if v.upper() == "BBOX":
                    _, lonc = self.next()
                    self.next()  # ,
                    _, latc = self.next()
                    arg = (lonc, latc)
                else:
                    t2, arg = self.next()
                    if t2 == "op" and arg == "*":
                        arg = "*"
                tc, vc = self.next()
                if not (tc == "op" and vc == ")"):
                    raise ValueError("GWQL: expected )")
                alias = (
                    "bbox" if v.upper() == "BBOX"
                    else f"{v.lower()}_{arg if arg != '*' else 'all'}"
                )
                t3, v3 = self.peek()
                if v3 and v3.upper() == "AS":
                    self.next()
                    _, alias = self.next()
                cols_out.append(("agg", v.upper(), arg, alias))
                is_agg = True
            else:
                cols_out.append(v)
            t, v = self.peek()
            if t == "op" and v == ",":
                self.next()
                continue
            break
        return cols_out, is_agg

    # --- predicate grammar -------------------------------------------
    def _or_expr(self) -> Expr:
        e = self._and_expr()
        while True:
            t, v = self.peek()
            if v and v.upper() == "OR":
                self.next()
                e = e | self._and_expr()
            else:
                return e

    def _and_expr(self) -> Expr:
        e = self._not_expr()
        while True:
            t, v = self.peek()
            if v and v.upper() == "AND":
                self.next()
                e = e & self._not_expr()
            else:
                return e

    def _not_expr(self) -> Expr:
        t, v = self.peek()
        if v and v.upper() == "NOT":
            self.next()
            return ~self._not_expr()
        return self._comparison()

    def _value(self):
        t, v = self.peek()
        if t == "kw" and v.upper() == "CAST":
            self.next()
            self.next()  # (
            raw = self._value()
            self.expect_kw("AS")
            _, typ = self.next()
            self.next()  # )
            return _cast_literal(raw, typ.upper())
        t, v = self.next()
        if t == "num":
            return float(v) if "." in v else int(v)
        if t == "str":
            return v
        raise ValueError(f"GWQL: expected literal, got {v!r}")

    def _comparison(self) -> Expr:
        t, v = self.peek()
        if t == "op" and v == "(":
            self.next()
            e = self._or_expr()
            tc, vc = self.next()
            if not (tc == "op" and vc == ")"):
                raise ValueError("GWQL: expected )")
            return e
        if t == "word" and v.upper() in (
            _FUNCS | _SPATIAL_PREDS | _TEMPORAL_PREDS
        ):
            return self._func_predicate()
        if (
            t == "word"
            and v.upper() in _SCALAR_FUNCS
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1] == ("op", "(")
        ):
            # scalar function on the LHS of a WHERE comparison
            # (WHERE AREA(geom) > 2.0, WHERE STRLENGTH(t) >= 5) —
            # same catalog/evaluator as the select list
            return self._scalar_comparison()
        t, name = self.next()
        left = col(name)
        t, op = self.next()
        if op is None:
            raise ValueError("GWQL: dangling predicate")
        u = op.upper() if isinstance(op, str) else op
        if u in _TEMPORAL_OPS:
            # temporal infix operators over instants/intervals —
            # TemporalOperators.java (Before/BeforeOrDuring/During/
            # DuringOrAfter/After); interval literals are 'start/end'
            from .cql import tcol

            ts, sval = self.next()
            if ts != "str":
                raise ValueError(f"GWQL: {u} expects a quoted time literal")
            te = _tliteral(sval)
            tc = tcol(name)
            return {
                "BEFORE": tc.before,
                "AFTER": tc.after,
                "DURING": tc.during,
                "BEFORE_OR_DURING": tc.before_or_during,
                "DURING_OR_AFTER": tc.during_or_after,
            }[u](te)
        if u == "BETWEEN":
            lo = self._value()
            self.expect_kw("AND")
            hi = self._value()
            return left.between(lo, hi)
        if u == "IN":
            self.next()  # (
            vals = [self._value()]
            while self.peek() == ("op", ","):
                self.next()
                vals.append(self._value())
            self.next()  # )
            return left.isin(vals)
        if u == "IS":
            t2, v2 = self.next()
            if v2 and v2.upper() == "NOT":
                self.expect_kw("NULL")
                return left.is_not_null()
            return left.is_null()
        val = self._value()
        if op == "=":
            return left == val
        if op in ("<>", "!="):
            return left != val
        if op == "<":
            return left < val
        if op == "<=":
            return left <= val
        if op == ">":
            return left > val
        if op == ">=":
            return left >= val
        raise ValueError(f"GWQL: unknown operator {op!r}")

    def _scalar_operand(self):
        """One side of a scalar WHERE comparison: a nested call node,
        a column token, or a literal token."""
        ta, va = self.next()
        if (
            ta == "word"
            and va.upper() in _SCALAR_FUNCS
            and self.peek() == ("op", "(")
        ):
            self.next()  # (
            return ("call", va.upper(), self._func_args())
        return (ta, va)

    def _scalar_comparison(self) -> Expr:
        left = self._scalar_operand()
        t2, op = self.next()
        kernels = {
            "=": pc.equal, "<>": pc.not_equal, "!=": pc.not_equal,
            "<": pc.less, "<=": pc.less_equal,
            ">": pc.greater, ">=": pc.greater_equal,
        }
        if t2 != "op" or op not in kernels:
            raise ValueError(
                f"GWQL: expected comparison after scalar function, got {op!r}"
            )
        right = self._scalar_operand()
        k = kernels[op]
        return Expr(lambda b: k(_eval_scalar(left, b), _eval_scalar(right, b)))

    def _func_predicate(self) -> Expr:
        _, fn = self.next()
        self.next()  # (
        f = fn.upper()
        if f in _SPATIAL_PREDS:
            return self._spatial_predicate(f)
        if f in _TEMPORAL_PREDS:
            # toverlaps/tcontains(field, 'start/end') —
            # TemporalPredicates.java:20-66
            from .cql import tcol

            _, cname = self.next()
            self.next()  # ,
            ts, sval = self.next()
            self.next()  # )
            if ts != "str":
                raise ValueError(f"GWQL: {f} expects a quoted time literal")
            te = _tliteral(sval)
            if f == "TOVERLAPS":
                return tcol(cname).time_overlaps(te)
            # TCONTAINS(field, v): the field's interval CONTAINS the
            # literal, i.e. the literal is DURING the field
            return te.during(tcol(cname))
        if f == "PIP":
            # PIP(lon_col, lat_col, CAST('POLYGON(...)' AS GEOMETRY)) —
            # the GWQL spatial-predicate role
            # (core/geotime/.../gwql/SpatialPredicates.java)
            import numpy as np
            import pyarrow as pa

            from .geom import pip_convex, pip_raycast

            _, lonc = self.next()
            self.next()  # ,
            _, latc = self.next()
            self.next()  # ,
            ring = self._value()
            self.next()  # )
            if isinstance(ring, str):
                ring = parse_wkt_polygon(ring)
            r = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
            # convex iff every consecutive-edge cross product >= 0
            x, y = r[:, 0], r[:, 1]
            ex, ey = np.roll(x, -1) - x, np.roll(y, -1) - y
            convex = bool(np.all(ex * np.roll(ey, -1) - ey * np.roll(ex, -1) >= 0))
            test = pip_convex if convex else pip_raycast

            def fnb(b):
                return pa.array(
                    test(b.column(lonc).to_numpy(), b.column(latc).to_numpy(), ring)
                )

            return Expr(fnb)
        _, cname = self.next()
        self.next()  # ,
        t, s = self.next()
        self.next()  # )
        c = col(cname)
        if f == "CONTAINS":
            return c.contains(s)
        if f == "STRSTARTSWITH":
            return c.starts_with(s)
        if f == "STRENDSWITH":
            return c.ends_with(s)
        raise ValueError(f"GWQL: unknown function {fn}")

    def _spatial_predicate(self, f: str) -> Expr:
        """GWQL spatial predicate functions over the point adapter
        (SpatialPredicates.java:24-252): bbox[Loose](geom, x0,y0,x1,y1
        [,'EPSG:n']), intersects[Loose]/disjoint[Loose]/within/touches/
        crosses/overlaps(geom, <WKT or CAST(... AS GEOMETRY)>). Loose
        variants test the literal's ENVELOPE only (the reference's
        index-constraint-only semantics)."""
        import numpy as np

        from .cql import scol

        self.next()  # geometry field ident (point adapter: self.geom)
        self.next()  # ,
        s = scol(*self.geom)
        if f in ("BBOX", "BBOXLOOSE"):
            vals = []
            for _k in range(4):
                vals.append(float(self._value()))
                if self.peek() == ("op", ","):
                    self.next()
            crs = None
            t, v = self.peek()
            if t == "str":
                crs = self.next()[1]
            self.next()  # )
            if crs and crs != "EPSG:4326":
                vals = _box_to_4326(vals, crs)
            # both tight and loose reduce to the envelope for points
            return s.bbox(*vals)
        g = self._value()
        self.next()  # )
        if isinstance(g, str):
            kind, data = _parse_wkt_any(g)
        else:  # CAST(... AS GEOMETRY) already yielded a ring
            kind, data = "ring", np.asarray(g, dtype=np.float64)
        if kind == "point":
            x, y = data
            if f in ("INTERSECTS", "INTERSECTSLOOSE"):
                return s.dwithin(x, y, 0.0)
            if f in ("DISJOINT", "DISJOINTLOOSE"):
                return ~s.dwithin(x, y, 0.0)
            raise ValueError(f"GWQL: {f} unsupported for POINT literal")
        ring = data
        if f in ("INTERSECTSLOOSE", "DISJOINTLOOSE"):
            env = (
                float(ring[:, 0].min()), float(ring[:, 1].min()),
                float(ring[:, 0].max()), float(ring[:, 1].max()),
            )
            e = s.bbox(*env)
            return e if f == "INTERSECTSLOOSE" else ~e
        return {
            "INTERSECTS": s.intersects,
            "DISJOINT": s.disjoint,
            "WITHIN": s.within,
            "TOUCHES": s.touches,
            "CROSSES": s.crosses,
            "OVERLAPS": s.overlaps,
        }[f](ring)


def _tliteral(s: str):
    """'2020-01-01' (instant) or '2020-01-01/2020-01-05' (interval) ->
    TemporalExpr — the reference's time-literal grammar."""
    from .cql import tlit

    if "/" in s:
        a, b = s.split("/", 1)
        return tlit(a, b)
    return tlit(s)


def _parse_wkt_any(wkt: str):
    """'POINT(x y)' -> ("point", (x, y)); POLYGON -> ("ring", ndarray)."""
    import numpy as np

    m = re.match(
        r"\s*POINT\s*\(\s*(-?[\d.]+)\s+(-?[\d.]+)\s*\)", wkt, re.IGNORECASE
    )
    if m:
        return "point", (float(m.group(1)), float(m.group(2)))
    return "ring", np.asarray(parse_wkt_polygon(wkt), dtype=np.float64)


def _box_to_4326(vals, crs: str):
    """Query envelope declared in another CRS -> 4326 envelope by edge
    sampling (the reference reprojects the query geometry to the index
    CRS; sampling handles non-monotone transforms like UTM)."""
    import numpy as np

    from .crs import CrsAdapter

    x0, y0, x1, y1 = vals
    t = np.linspace(0.0, 1.0, 65)
    ex = np.concatenate([
        x0 + (x1 - x0) * t, np.full_like(t, x1),
        x1 + (x0 - x1) * t, np.full_like(t, x0),
    ])
    ey = np.concatenate([
        np.full_like(t, y0), y0 + (y1 - y0) * t,
        np.full_like(t, y1), y1 + (y0 - y1) * t,
    ])
    lon, lat = CrsAdapter(crs).to_index(ex, ey)
    return [float(lon.min()), float(lat.min()),
            float(lon.max()), float(lat.max())]


def _cast_literal(raw, typ: str):
    """Literal casts (the reference's DateCastableType /
    GeometryCastableType — geotime ``gwql/``)."""
    if typ in ("DATE", "TIMESTAMP"):
        from datetime import datetime

        return datetime.fromisoformat(str(raw))
    if typ in ("BIGINT", "INTEGER"):
        return int(raw)
    if typ == "DOUBLE":
        return float(raw)
    if typ == "VARCHAR":
        return str(raw)
    if typ == "GEOMETRY":
        return parse_wkt_polygon(str(raw))
    raise ValueError(f"GWQL: unknown cast type {typ}")


def _pa_type(typ: str):
    import pyarrow as pa

    return {
        "DATE": pa.timestamp("us"),
        "TIMESTAMP": pa.timestamp("us"),
        "BIGINT": pa.int64(),
        "INTEGER": pa.int32(),
        "DOUBLE": pa.float64(),
        "VARCHAR": pa.string(),
    }[typ]


def parse(sql: str, geom: tuple[str, str] = ("lon", "lat")) -> Select:
    toks = tokenize(sql)
    if toks and str(toks[0][1]).upper() == "DELETE":
        # DELETE FROM t WHERE pred  -> modeled as SELECT * minus matches
        p = _Parser(toks, geom)
        p.next()  # DELETE
        p.expect_kw("FROM")
        _, table = p.next()
        where = None
        t, v = p.peek()
        if v and v.upper() == "WHERE":
            p.next()
            where = p._or_expr()
        return Select(["*"], table, where, None, False, None, is_delete=True)
    return _Parser(toks, geom).parse()


def execute(
    sql: str,
    tables: dict[str, ray.data.Dataset],
    geom: tuple[str, str] = ("lon", "lat"),
) -> ray.data.Dataset:
    """Run a GWQL SELECT over named Datasets."""
    return execute_stmt(parse(sql, geom), tables)


def execute_stmt(
    stmt: Select, tables: dict[str, ray.data.Dataset]
) -> ray.data.Dataset:
    """Run an already-parsed statement (callers that routed on the
    parse — e.g. the DataStore facade's pruned-scan path — avoid
    parsing twice)."""
    if stmt.table not in tables:
        raise KeyError(f"GWQL: unknown table {stmt.table}")
    ds = tables[stmt.table]
    if stmt.is_delete:
        # GWQL DELETE (DeleteStatement.java): survivors of NOT(pred) —
        # the caller rewrites the layout with the returned Dataset
        if stmt.where is None:
            return ds.filter(expr="false")
        inv = ~stmt.where
        return ds.map_batches(inv.filter_batch, batch_format="pyarrow", batch_size=None)
    if stmt.where is not None:
        e = stmt.where
        ds = ds.map_batches(e.filter_batch, batch_format="pyarrow", batch_size=None)
    if stmt.is_agg:
        from ray.data.aggregate import Count, Max, Min, Sum

        aggs = []
        for c in stmt.columns:
            if isinstance(c, str):
                # plain columns are only legal as GROUP BY keys
                if not stmt.group_by or c not in stmt.group_by:
                    raise ValueError(
                        "GWQL: non-aggregate column must appear in GROUP BY"
                    )
                continue
            _, fn, arg, alias = c
            if fn == "COUNT":
                # COUNT(*) counts rows; COUNT(col) counts non-null values
                # (SQL/GWQL semantics — CountAggregation.java)
                if arg and arg != "*":
                    aggs.append(Count(on=arg, ignore_nulls=True, alias_name=alias))
                else:
                    aggs.append(Count(alias_name=alias))
            elif fn == "MIN":
                aggs.append(Min(arg, alias_name=alias))
            elif fn == "MAX":
                aggs.append(Max(arg, alias_name=alias))
            elif fn == "SUM":
                aggs.append(Sum(arg, alias_name=alias))
            elif fn == "BBOX":
                # spatial envelope aggregate (BboxFunction.java:25)
                lonc, latc = arg
                pre = "" if alias == "bbox" else alias + "_"
                aggs += [
                    Min(lonc, alias_name=pre + "minx"),
                    Min(latc, alias_name=pre + "miny"),
                    Max(lonc, alias_name=pre + "maxx"),
                    Max(latc, alias_name=pre + "maxy"),
                ]
        if stmt.group_by:
            out = ds.groupby(stmt.group_by).aggregate(*aggs)
            if stmt.order_by:
                out = out.sort(
                    [c for c, _ in stmt.order_by],
                    descending=[d for _, d in stmt.order_by],
                )
            if stmt.limit is not None:
                out = out.limit(stmt.limit)
            return out
        row = (ds.aggregate(*aggs) if aggs else {}) or {}
        # Ray's global Count() aggregate yields 0 when the stream holds
        # empty blocks (post-filter); Dataset.count() is authoritative
        for c in stmt.columns:
            if isinstance(c, tuple) and c[1] == "COUNT" and c[2] == "*":
                row[c[3]] = ds.count()
        import pandas as pd

        return ray.data.from_pandas(pd.DataFrame([row]))
    if stmt.columns != ["*"]:
        if any(isinstance(c, tuple) for c in stmt.columns):
            import pyarrow as pa
            import pyarrow.compute as pc

            sel = list(stmt.columns)

            def project(b: pa.Table) -> pa.Table:
                cols = {}
                for c in sel:
                    if isinstance(c, str):
                        cols[c] = b.column(c)
                    elif c[0] == "func":
                        _, fname, args, alias = c

                        def val(a):
                            return _eval_scalar(a, b)

                        from .cql import _CQL_FUNCS

                        if fname == "ABS":
                            cols[alias] = pc.abs(val(args[0]))
                        elif fname.lower() in _CQL_FUNCS:
                            arity, kern = _CQL_FUNCS[fname.lower()]
                            if len(args) != arity:
                                raise ValueError(
                                    f"GWQL: {fname} takes {arity} "
                                    f"argument(s), got {len(args)}"
                                )
                            cols[alias] = kern(*[val(a) for a in args])
                        else:  # CONCAT: string-cast every arg, join
                            parts = [
                                x
                                if pa.types.is_string(x.type)
                                or pa.types.is_large_string(x.type)
                                else pc.cast(x, pa.string())
                                for x in (val(a) for a in args)
                            ]
                            cols[alias] = pc.binary_join_element_wise(*parts, "")
                    else:
                        _, cname, typ, alias = c
                        cols[alias] = pc.cast(b.column(cname), _pa_type(typ))
                return pa.table(cols)

            ds = ds.map_batches(project, batch_format="pyarrow", batch_size=None)
        else:
            ds = ds.select_columns([c for c in stmt.columns])
    if stmt.order_by:
        ds = ds.sort(
            [c for c, _ in stmt.order_by],
            descending=[d for _, d in stmt.order_by],
        )
    if stmt.limit is not None:
        ds = ds.limit(stmt.limit)
    return ds
