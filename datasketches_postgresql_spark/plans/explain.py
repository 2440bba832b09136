"""Plan-quality assertions: the engine's scale posture is only real if the
physical plans show it. These helpers read ``explain('formatted')`` output
and assert the properties SURVEY.md §4 commits to:

- filters/column pruning reach the parquet scan (PushedFilters/ReadSchema);
- small dimension sides broadcast (BroadcastHashJoin);
- built-in expression stages run inside WholeStageCodegen;
- no more Exchange (shuffle) nodes than the operator's contract allows.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    out = []
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            out.append(s.removeprefix("PushedFilters:").strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    return [
        line.strip().removeprefix("ReadSchema:").strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def count_exchanges(df: DataFrame) -> int:
    import re

    # formatted plans list each node once as "(N) Exchange ..." in the
    # detail section (the tree section repeats them)
    return sum(
        1
        for line in formatted_plan(df).splitlines()
        if re.match(r"^\(\d+\) (Exchange|AQEShuffleRead)", line.strip())
        and line.strip().split()[1] == "Exchange"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # simple-mode explain marks codegen stages with "*(n)"
    plan = simple_plan(df)
    return "WholeStageCodegen" in plan or "*(" in plan


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    pf = pushed_filters(df)
    assert any(fragment in p for p in pf), f"filter '{fragment}' not pushed; got {pf}"


def assert_column_pruned(df: DataFrame, absent_col: str) -> None:
    rs = read_schema(df)
    assert rs, "no parquet scan in plan"
    assert all(absent_col not in s for s in rs), (
        f"column '{absent_col}' read but not needed; ReadSchema {rs}"
    )
