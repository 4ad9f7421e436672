"""Schema-conformance operators (reference P8/P9/P10/P11, SURVEY.md §2.2).

The reference tolerates ragged inputs by renaming only columns that exist and
null-filling missing ones (reference cola_transformer.py:165-167, 271-287;
unified_transformer.py:190-207). Here the same tolerance is an explicit,
cheap, narrow (shuffle-free) operator set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def rename_existing(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P8 — bulk rename applied only to columns actually present."""
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present) if present else df


def ensure_columns(df: DataFrame, cols: dict[str, str] | list[str]) -> DataFrame:
    """P9 — add missing columns as typed nulls so downstream joins/selects
    never fail. `cols` is {name: ddl_type} or a list (string type)."""
    if isinstance(cols, list):
        cols = {c: "string" for c in cols}
    missing = {c: F.lit(None).cast(t) for c, t in cols.items() if c not in df.columns}
    return df.withColumns(missing) if missing else df


def default_fill(df: DataFrame, defaults: dict[str, Column]) -> DataFrame:
    """P10 — create absent metadata columns with default expressions
    (reference fills 建立時間 := now, KP := '')."""
    missing = {c: e for c, e in defaults.items() if c not in df.columns}
    return df.withColumns(missing) if missing else df


def blank_strings_to_null(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """P11 — whitespace-only strings -> NULL across all string columns
    (reference unified_transformer.py:539-544 does this elementwise over the
    whole frame; here it is a single narrow projection)."""
    targets = set(columns) if columns is not None else {
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    }
    # selectExpr with pre-composed SQL strings: the strings parse JVM-side,
    # vs ~6 py4j round-trips per column for the Column form (~0.6 s of
    # plan construction at 94 columns).
    exprs = []
    for c in df.columns:
        q = "`" + c.replace("`", "``") + "`"
        if c in targets:
            exprs.append(f"CASE WHEN trim({q}) = '' THEN NULL ELSE {q} END AS {q}")
        else:
            exprs.append(q)
    return df.selectExpr(*exprs)


def one_eval_barrier(df: DataFrame) -> DataFrame:
    """Structural one-evaluation barrier: everything ABOVE this point
    references the columns computed BELOW it as plain attributes.

    explode(array(struct(*))) is a Generate node: CollapseProject cannot
    inline a generator output into upper expressions, and predicate
    pushdown rewrites upper filters in terms of the generator's output
    fields instead of substituting the full producing expression — so a
    computed column evaluates exactly ONCE per row no matter how many
    upper expressions (projections, filter conditions, join-key
    null-checks) reference it. This matters twice on expression-heavy
    plans: per-row cost (a CASE whose branches repeat a regex subtree
    re-executes it at every reference — CASE branches are excluded from
    codegen subexpression elimination), and compiled-code SIZE (a fused
    projection whose inlined expressions exceed janino's hard 64 KB
    method limit throws the whole stage back to interpreted execution —
    the generated `project_doConsume` must stay under the limit).
    Cost: one struct wrap/unwrap per row, and column pruning stops at the
    barrier — callers must project needed columns first."""
    return df.select(F.explode(F.array(F.struct("*"))).alias("_r")).select("_r.*")


def select_aliased(df: DataFrame, exprs: dict[str, Column]) -> DataFrame:
    """P7 — wide projection builder: one select with every output column an
    aliased expression (the engine's flagship projection node; the
    reference's 94-column rebuild at unified_transformer.py:290-503)."""
    return df.select(*[e.alias(name) for name, e in exprs.items()])
