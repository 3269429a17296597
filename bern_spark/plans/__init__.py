"""Physical-plan inspection helpers (SURVEY §4).

Used by tests to assert the plans Catalyst actually picks: dictionary
joins must be broadcast (no shuffle), parquet scans must show pushed
filters/pruned schemas, UDF stages must be ArrowEvalPython (never
BatchEvalPython — the row-at-a-time Python path is banned by the
input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def assert_no_row_python(df: DataFrame) -> None:
    """Arrow-batched Python only: BatchEvalPython = row-at-a-time UDF."""
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, plan


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    assert "PushedFilters" in plan and fragment in plan, plan
