"""User-extension function registry.

The reference exposes SPI registries for user extensions
(``core/store/.../query/gwql/GWQLExtensionRegistrySpi.java``,
``statistics/StatisticsRegistrySPI``, custom ``Aggregation``/
``CustomIndexStrategy``). The Ray-native analogue is a plain dict of
named callables over pyarrow arrays — registered once, usable from the
expression layer or directly in ``map_batches``.

Built-ins mirror the GWQL function set (ABS, CONCAT, UPPER, LOWER,
STRLEN); ``register`` adds user functions.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from ..expr import Expr

_REGISTRY: dict[str, Callable] = {}


def register(name: str, fn: Callable) -> None:
    """Register a vectorized scalar function (array -> array)."""
    _REGISTRY[name.upper()] = fn


def get(name: str) -> Callable:
    return _REGISTRY[name.upper()]


def names() -> list[str]:
    return sorted(_REGISTRY)


def apply(name: str, expr: Expr) -> Expr:
    """Lift a registered function over an expression column."""
    fn = get(name)
    return Expr(lambda b: fn(expr.evaluate(b)))


# built-ins (the GWQL function set)
register("ABS", pc.abs)
register("UPPER", pc.utf8_upper)
register("LOWER", pc.utf8_lower)
register("STRLEN", pc.utf8_length)


def _concat(*arrays):
    return pc.binary_join_element_wise(*arrays, "")


register("CONCAT", _concat)
