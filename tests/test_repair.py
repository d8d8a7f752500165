"""Repair-pass parity tests (pure Python, no Spark) — the §2.3 heuristics."""

from __future__ import annotations

from gemini_data_wrangler_spark.plans.repair import repair_stage
from gemini_data_wrangler_spark.plans.sql_parser import parse_sql_to_stages
from gemini_data_wrangler_spark.plans.stage import Stage, validate_stage


def _stage(t, desc="", **data):
    return Stage(type=t, description=desc, data=data)


class TestJoinRepair:
    def test_value_fills_keys(self):
        s = repair_stage(_stage("JOIN", value="customer_id", leftTable="a", rightTable="b"))
        assert s.data["leftKey"] == "customer_id" and s.data["rightKey"] == "customer_id"
        assert s.data["joinType"] == "INNER"

    def test_invalid_value_rejected_then_description_inferred(self):
        s = repair_stage(_stage("JOIN", "join on order id", value="none", leftTable="a", rightTable="b"))
        assert s.data["leftKey"] == "order_id"

    def test_generic_id_regex(self):
        s = repair_stage(_stage("JOIN", "join tables on supplier_id", leftTable="a", rightTable="b"))
        assert s.data["leftKey"] == "supplier_id"

    def test_fallback_id(self):
        s = repair_stage(_stage("JOIN", "merge the tables", leftTable="a", rightTable="b"))
        assert s.data["leftKey"] == "id"


class TestFilterRepair:
    def test_numeric_value_infers_amount_gt(self):
        s = repair_stage(_stage("FILTER", "filter by amount", table="t", value="100"))
        assert s.data["column"] == "amount" and s.data["operator"] == ">"

    def test_string_value_infers_status_eq(self):
        s = repair_stage(_stage("FILTER", "only active status", table="t", value="active"))
        assert s.data["column"] == "status" and s.data["operator"] == "="

    def test_no_criteria_generic_fallback(self):
        s = repair_stage(_stage("FILTER", "some filter", table="t"))
        assert (s.data["column"], s.data["operator"], s.data["value"]) == ("amount", ">", "0")

    def test_high_value_orders(self):
        s = repair_stage(_stage("FILTER", "keep high value orders", table="t"))
        assert (s.data["column"], s.data["operator"], s.data["value"]) == ("amount", ">", "100")

    def test_column_validation_fuzzy_like_wrap(self):
        s = _stage("FILTER", table="t", column="custname", operator="=", value="Alice")
        s = repair_stage(s, available_columns=["c_name", "c_acctbal"])
        assert s.data["column"] == "c_name"
        assert s.data["operator"] == "LIKE"
        assert s.data["value"] == "%Alice%"

    def test_column_validation_numeric_alternative(self):
        s = _stage("FILTER", table="t", column="missing", operator="=", value="42")
        s = repair_stage(s, available_columns=["o_totalprice", "o_orderstatus"])
        assert s.data["column"] == "o_totalprice"
        assert s.data["operator"] == ">"


class TestGroupRepair:
    def test_infer_from_description_plus_default_agg(self):
        s = repair_stage(_stage("GROUP", "group by customer", table="t"))
        assert s.data["groupBy"] == ["customer_id"]
        assert s.data["aggregations"] == [{"function": "COUNT", "column": "*", "alias": "count"}]

    def test_unrecoverable_returns_none(self):
        assert repair_stage(_stage("GROUP", "do something", table="t")) is None

    def test_column_validation_fuzzy(self):
        s = _stage("GROUP", table="t", groupBy=["mktsegment"], aggregations=[{"function": "COUNT", "column": "*"}])
        s = repair_stage(s, available_columns=["c_custkey", "c_mktsegment"])
        assert s.data["groupBy"] == ["c_mktsegment"]

    def test_column_validation_first_col_fallback(self):
        s = _stage("GROUP", table="t", groupBy=["zzz"], aggregations=[{"function": "COUNT", "column": "*"}])
        s = repair_stage(s, available_columns=["c_custkey", "c_name"])
        assert s.data["groupBy"] == ["c_custkey"]


class TestValidateStage:
    def test_join_requires_all_keys(self):
        assert not validate_stage(_stage("JOIN", leftTable="a", rightTable="b", leftKey="k"))
        assert validate_stage(_stage("JOIN", leftTable="a", rightTable="b", leftKey="k", rightKey="k"))

    def test_filter_rejects_empty_value(self):
        assert not validate_stage(_stage("FILTER", table="t", column="c", operator="=", value=""))
        assert validate_stage(_stage("FILTER", table="t", column="c", operator="=", value="x"))

    def test_custom_requires_nonblank_sql(self):
        assert not validate_stage(_stage("CUSTOM", sql="   "))
        assert validate_stage(_stage("CUSTOM", sql="SELECT 1"))


class TestSqlParser:
    def test_join_extraction(self):
        stages = parse_sql_to_stages(
            "SELECT * FROM orders o LEFT JOIN customers c ON o.customer_id = c.id"
        )
        join = next(s for s in stages if s["type"] == "JOIN")
        assert join["data"]["joinType"] == "LEFT"
        assert join["data"]["leftTable"] == "orders"
        assert join["data"]["rightTable"] == "customers"
        assert join["data"]["leftKey"] == "customer_id"
        assert join["data"]["rightKey"] == "id"

    def test_group_and_sort(self):
        stages = parse_sql_to_stages(
            "SELECT status, SUM(amount) AS total FROM sales GROUP BY status ORDER BY total DESC"
        )
        types = [s["type"] for s in stages]
        assert "GROUP" in types and "SORT" in types
        group = next(s for s in stages if s["type"] == "GROUP")
        assert group["data"]["groupBy"] == ["status"]
        assert group["data"]["aggregations"] == [{"function": "SUM", "column": "amount", "alias": "total"}]

    def test_group_regex_quirk_on_order_chars(self):
        # Faithful port of the reference's [^ORDER] char-class quirk
        # (ui/src/sqlParser.ts:44): a group column starting with any of
        # o/r/d/e — like 'region' — cannot be captured, so no GROUP stage
        # is produced (the SELECT branch picks up the columns instead).
        stages = parse_sql_to_stages("SELECT region, SUM(x) FROM t GROUP BY region")
        assert not any(s["type"] == "GROUP" for s in stages)

    def test_filter_extraction(self):
        stages = parse_sql_to_stages("SELECT * FROM t WHERE amount > 100")
        f = next(s for s in stages if s["type"] == "FILTER")
        assert f["data"] == {"table": "t", "column": "amount", "operator": ">", "value": "100"}

    def test_union_extraction(self):
        stages = parse_sql_to_stages("SELECT * FROM a UNION ALL SELECT * FROM b")
        u = next(s for s in stages if s["type"] == "UNION")
        assert u["data"]["unionType"] == "UNION ALL"
        assert u["data"]["tables"] == ["a", "b"]

    def test_custom_fallback(self):
        stages = parse_sql_to_stages("DESCRIBE t", "explain")
        assert stages == [{"type": "CUSTOM", "description": "explain", "data": {"sql": "DESCRIBE t"}}]
