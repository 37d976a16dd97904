"""Signed-zero / NaN oracle hygiene (round 6).

Round 5 shipped `knn_cosine` red because DuckDB's round() preserved the
sign of an epsilon-negative self-match cosine distance (-2.2e-16 ->
-0.0) while Spark's BigDecimal round returned +0.0 — and the local
harness compared floats with math.isclose, for which -0.0 == 0.0.
Two permanent guards:

1. A harness regression test: compare() must flag a -0.0/+0.0 pair.
2. A property sweep: every registered DuckDB oracle, run at sf0.001,
   must not emit -0.0 or NaN unless the Spark twin produces a value
   with the identical repr in the same (sorted) cell. The sweep is
   DuckDB-only in the common case — the Spark twin only runs for the
   rare oracle that actually emits a suspicious float.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from custom_vector_database_spark import queries_registry as reg
from tests.oracle_harness import _normalize, compare, duck_connection


def test_compare_flags_signed_zero(spark):
    """A -0.0 oracle value vs a +0.0 Spark value must fail compare(),
    exactly as the driver's value-hash would."""
    sp = spark.createDataFrame([(1, 0.0)], "id int, dist double")
    du = pd.DataFrame({"id": pd.Series([1], dtype="int32"),
                       "dist": [-0.0]})
    errs = compare(sp, du, "signed_zero_regression")
    assert errs and "signed-zero" in errs[0], errs


def test_compare_accepts_matching_zeros(spark):
    sp = spark.createDataFrame([(1, 0.0), (2, -0.0)], "id int, dist double")
    du = pd.DataFrame({"id": pd.Series([1, 2], dtype="int32"),
                       "dist": [0.0, -0.0]})
    assert compare(sp, du, "matching_zeros") == []


@pytest.fixture(scope="module")
def duck_smoke(sf_smoke):
    con = duck_connection(sf_smoke)
    yield con
    con.close()


def _suspicious_cells(df: pd.DataFrame) -> list[tuple[str, int, float]]:
    """(col, row, value) for every -0.0 or NaN float cell, on the
    column-sorted / row-sorted frame the driver hashes."""
    out: list[tuple[str, int, float]] = []
    for col in df.columns:
        if df[col].dtype.kind != "f":
            continue
        for i, v in enumerate(df[col]):
            f = float(v)
            if math.isnan(f) or (f == 0.0 and math.copysign(1.0, f) < 0):
                out.append((col, i, f))
    return out


@pytest.mark.parametrize("name", sorted(reg.ORACLES))
def test_oracle_emits_no_unmatched_special_floats(
    spark, duck_smoke, sf_smoke, name
):
    du = _normalize(duck_smoke.sql(reg.ORACLES[name]).df())
    cells = _suspicious_cells(du)
    if not cells:
        return
    # The oracle produced -0.0/NaN — legal only if the Spark twin
    # produces the bit-identical repr in the same sorted cell.
    sp = _normalize(reg.QUERIES[name](spark, sf_smoke).toPandas())
    assert list(sp.columns) == list(du.columns), name
    assert len(sp) == len(du), name
    bad = [
        (col, i, v, float(sp[col].iloc[i]))
        for (col, i, v) in cells
        if repr(float(sp[col].iloc[i])) != repr(v)
    ]
    assert not bad, f"{name}: oracle -0.0/NaN without identical Spark twin: {bad}"
