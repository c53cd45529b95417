"""Generic structural AST utilities: transform, walk, aggregate detection.

The reference decomposes aggregates with a bespoke 3-level split
(reference: src/framequery/executor/_executor.py:451-519). We instead rewrite
group-key subtrees to pre-computed columns and let Spark's analyzer validate —
these helpers provide the structural rewrite machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, Set

from ..parser import ast


def transform(node, fn: Callable):
    """Bottom-up structural rewrite. fn(node) -> node (possibly new).

    Does not descend into subquery bodies (Select/SetOp) — those have their
    own scopes.
    """
    if isinstance(node, (ast.Select, ast.SetOp)) or not isinstance(node, ast.Node):
        return fn(node) if isinstance(node, ast.Node) else node
    changed = {}
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if isinstance(v, ast.Node):
            nv = transform(v, fn)
            if nv is not v:
                changed[f.name] = nv
        elif isinstance(v, tuple):
            nvs = []
            any_changed = False
            for item in v:
                if isinstance(item, ast.Node):
                    ni = transform(item, fn)
                    any_changed |= ni is not item
                    nvs.append(ni)
                elif isinstance(item, tuple):  # Case whens: ((cond, res), ...)
                    ni = tuple(
                        transform(x, fn) if isinstance(x, ast.Node) else x
                        for x in item
                    )
                    any_changed |= ni != item
                    nvs.append(ni)
                else:
                    nvs.append(item)
            if any_changed:
                changed[f.name] = tuple(nvs)
    if changed:
        node = dataclasses.replace(node, **changed)
    return fn(node)


def map_children(node, fn: Callable):
    """Rebuild *node* with fn applied to each direct child Node (fn is
    responsible for its own recursion). Subquery bodies are left alone."""
    if isinstance(node, (ast.Select, ast.SetOp)) or not isinstance(node, ast.Node):
        return node
    changed = {}
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if isinstance(v, ast.Node):
            nv = fn(v)
            if nv is not v:
                changed[f.name] = nv
        elif isinstance(v, tuple):
            nvs = []
            any_changed = False
            for item in v:
                if isinstance(item, ast.Node):
                    ni = fn(item)
                    any_changed |= ni is not item
                    nvs.append(ni)
                elif isinstance(item, tuple):
                    ni = tuple(fn(x) if isinstance(x, ast.Node) else x
                               for x in item)
                    any_changed |= ni != item
                    nvs.append(ni)
                else:
                    nvs.append(item)
            if any_changed:
                changed[f.name] = tuple(nvs)
    return dataclasses.replace(node, **changed) if changed else node


def walk(node, into_subqueries: bool = False) -> Iterator[ast.Node]:
    """Pre-order traversal of all Node instances."""
    if not isinstance(node, ast.Node):
        return
    yield node
    if isinstance(node, (ast.Select, ast.SetOp)) and not into_subqueries:
        return
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if isinstance(v, ast.Node):
            yield from walk(v, into_subqueries)
        elif isinstance(v, tuple):
            for item in v:
                if isinstance(item, ast.Node):
                    yield from walk(item, into_subqueries)
                elif isinstance(item, tuple):
                    for x in item:
                        if isinstance(x, ast.Node):
                            yield from walk(x, into_subqueries)


def contains_aggregate(node, agg_names: Set[str]) -> bool:
    """True if *node* contains a set-function call outside a window spec or
    subquery."""
    if isinstance(node, ast.WindowCall):
        return False
    if isinstance(node, ast.Call):
        if node.name in agg_names or (node.star and node.name == "count"):
            return True
        # hypothetical-set aggregates: rank(v) WITHIN GROUP (ORDER BY c)
        # — aggregate ONLY in the WITHIN GROUP form (bare rank() is a
        # window function)
        if node.name in ("rank", "dense_rank", "percent_rank",
                         "cume_dist") and node.order_within and node.args:
            return True
    if not isinstance(node, ast.Node) or isinstance(node, (ast.Select, ast.SetOp)):
        return False
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if isinstance(v, ast.Node):
            if contains_aggregate(v, agg_names):
                return True
        elif isinstance(v, tuple):
            for item in v:
                if isinstance(item, ast.Node):
                    if contains_aggregate(item, agg_names):
                        return True
                elif isinstance(item, tuple):
                    for x in item:
                        if isinstance(x, ast.Node) and contains_aggregate(x, agg_names):
                            return True
    return False
