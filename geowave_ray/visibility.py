"""Row-level visibility expressions — the reference's full boolean
label algebra (``core/store/src/main/java/org/locationtech/geowave/
core/store/data/visibility/VisibilityExpression.java:17-60``), not
just '&'-conjunctions (VERDICT r3 #4):

- tokens: label strings, ``&`` (AND), ``|`` (OR), parentheses
- NO precedence between ``&`` and ``|`` — strictly left-associative
  accumulation, exactly as the reference's ``parseTokens`` folds
  ``left = new AndNode/OrNode(left, newNode)`` token by token
- whitespace stripped before parsing; the empty expression (and an
  empty parenthesis group) evaluates TRUE (public row / NoAuthNode)
- a label evaluates ``label in authorizations`` (ValueNode)
- malformed input (dangling operator, unbalanced parens, two
  sequential operands/operators) raises ``ValueError`` like the
  reference's ``ParseException``

Evaluation is compiled once per distinct expression string
(``lru_cache``) into a closure tree; the batch path in
``pipelines.query.visibility_filter`` dictionary-encodes the column so
each DISTINCT expression is evaluated once per batch (visibility
cardinality is tiny) and the boolean fans back through the indices —
no per-row Python.
"""

from __future__ import annotations

import re
from functools import lru_cache

_TOKEN = re.compile(r"([()&|])")
_WS = re.compile(r"\s+")


def _parse(tokens: list[str], i: int, depth: int):
    """Left-associative fold over tokens[i:] until ')' at this depth
    or end; returns (evaluator, next_index). Mirrors the reference's
    parseTokens/findMatchingParen control flow."""
    left = None
    operator = None
    n = len(tokens)
    while i < n:
        tok = tokens[i]
        node = None
        if tok == "(":
            node, i = _parse(tokens, i + 1, depth + 1)
            if i >= n or tokens[i] != ")":
                raise ValueError(
                    "Left parenthesis found with no matching right parenthesis."
                )
            i += 1
        elif tok == ")":
            if depth == 0:
                raise ValueError(
                    "Right parenthesis found with no matching left parenthesis."
                )
            break
        elif tok in ("&", "|"):
            if left is None:
                raise ValueError("Operator found with no left operand.")
            if operator is not None:
                raise ValueError("Multiple sequential operators.")
            operator = tok
            i += 1
            continue
        else:
            node = (lambda v: lambda auths: v in auths)(tok)
            i += 1
        if node is not None:
            if left is None:
                left = node
            elif operator is None:
                raise ValueError("Multiple sequential operands with no operator.")
            elif operator == "&":
                left = (lambda l, r: lambda auths: l(auths) and r(auths))(left, node)
                operator = None
            else:
                left = (lambda l, r: lambda auths: l(auths) or r(auths))(left, node)
                operator = None
    if operator is not None:
        raise ValueError("Operator found with no right operand.")
    if left is None:
        left = lambda auths: True  # NoAuthNode
    return left, i


@lru_cache(maxsize=1024)
def compile_visibility(expression: str):
    """expression string -> ``evaluate(auths: set) -> bool`` closure.
    Cached per distinct (whitespace-stripped) expression, mirroring the
    reference's expressionCache."""
    trimmed = _WS.sub("", expression or "")
    if not trimmed:
        return lambda auths: True
    tokens = [t for t in _TOKEN.split(trimmed) if t != ""]
    node, i = _parse(tokens, 0, 0)
    if i != len(tokens):
        raise ValueError(
            "Right parenthesis found with no matching left parenthesis."
        )
    return node


def evaluate_visibility(expression: str, authorizations) -> bool:
    return compile_visibility(expression)(authorizations)
