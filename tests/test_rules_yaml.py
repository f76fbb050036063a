"""YAML rule repository: round-trip, CRUD, priority order, validation, and
end-to-end execution equality with the hand-built rule pipeline."""

import dataclasses
import os

import pyarrow.compute as pc
import pytest

from sql_graph_visualizer_ray.config import (
    Computed,
    NodeRule,
    Predicate,
    RelationshipRule,
    RuleSet,
    rule_from_dict,
    rule_to_dict,
)

RULES = [
    NodeRule(
        name="suppliers",
        source_table="supplier",
        target_type="Supplier",
        field_mappings={"s_suppkey": "id", "s_name": "name"},
        filters=(Predicate("s_acctbal", ">", 0.0),),
        computed=(Computed(name="label", kind="concat", parts=("S-", "col:s_name")),),
        priority=5,
    ),
    NodeRule(
        name="customers",
        source_table="customer",
        target_type="Customer",
        field_mappings={"c_custkey": "id"},
        priority=1,
    ),
    RelationshipRule(
        name="supplies",
        relation_type="SUPPLIES",
        source_type="Supplier",
        target_type="Customer",
        priority=9,
    ),
]


def test_yaml_round_trip(tmp_path):
    rs = RuleSet(RULES)
    p = str(tmp_path / "rules.yml")
    rs.save_yaml(p)
    back = RuleSet.load_yaml(p)
    assert back.rules == RULES  # frozen dataclasses compare by value


def test_dict_round_trip_preserves_everything():
    for r in RULES:
        assert rule_from_dict(rule_to_dict(r)) == r


def test_crud_and_priority():
    rs = RuleSet(RULES)
    assert rs.get("customers").priority == 1
    rs.update_rule_priority("customers", 7)
    assert rs.get("customers").priority == 7
    # execution order follows priority within the node pass
    order = [r.name for r in rs.ordered()]
    assert order == ["suppliers", "customers", "supplies"]
    rs.update_rule_priority("customers", 1)
    assert [r.name for r in rs.ordered()] == ["customers", "suppliers", "supplies"]
    # relationship rules always run after node rules regardless of priority
    rs.update_rule_priority("supplies", 0)
    assert [r.name for r in rs.ordered()][-1] == "supplies"
    assert rs.delete_rule("suppliers")
    assert not rs.delete_rule("suppliers")
    assert rs.get("suppliers") is None
    with pytest.raises(KeyError):
        rs.update_rule_priority("nope", 3)


def test_validate_catches_problems():
    rs = RuleSet(RULES)
    assert rs.validate(known_tables={"supplier", "customer"}) == []
    rs.save_rule(
        RelationshipRule(name="dangling", relation_type="X", source_type="Ghost")
    )
    problems = rs.validate()
    assert any("Ghost" in p for p in problems)
    rs2 = RuleSet([dataclasses.replace(RULES[0], field_mappings={})])
    assert any("field_mappings" in p for p in rs2.validate())
    rs3 = RuleSet([RULES[1], RULES[1]])
    assert any("duplicate" in p for p in rs3.validate())


def test_run_rules_from_yaml_matches_handbuilt(ray_session, tmp_path):
    """The YAML-loaded customer/nation rules must produce the exact edges of
    the hand-built rel_customer_nation pipeline, restricted by the YAML's
    tables.where extraction filter (c_acctbal > 0)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from sql_graph_visualizer_ray.pipelines.queries import (
        rel_customer_nation,
        rules_from_yaml,
    )

    sf = "/root/testdata/sf0.001"
    got = rules_from_yaml(sf).to_pandas()
    cust = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    positive = set(cust.loc[cust["c_acctbal"] > 0, "c_custkey"])
    want = rel_customer_nation(sf).to_pandas()
    want = want[want["source_id"].isin(positive)]
    key = ["source_id", "target_id"]
    got = got.sort_values(key, ignore_index=True)
    want = want.sort_values(key, ignore_index=True)
    assert len(got) < len(rel_customer_nation(sf).to_pandas())  # filter bites
    assert got.equals(want)


def test_table_filter_semantics():
    """Blacklist beats whitelist; both case-insensitive; where/limit lookup
    is case-insensitive too — mirroring applyTableFiltering/isInList
    (mysql/repository.go:285-319)."""
    from sql_graph_visualizer_ray.config import TableFilter

    tf = TableFilter(
        whitelist=("CUSTOMER", "nation", "part"),
        blacklist=("Part",),
        where={"Customer": (Predicate("c_acctbal", ">", 0),)},
    )
    assert tf.allows("customer") and tf.allows("NATION")
    assert not tf.allows("part")  # blacklist wins over whitelist
    assert not tf.allows("orders")  # not whitelisted
    assert tf.select(["customer", "orders", "part", "nation"]) == [
        "customer",
        "nation",
    ]
    assert tf.where_for("CUSTOMER")[0].column == "c_acctbal"
    assert tf.where_for("nation") == ()
    # no whitelist -> everything except the blacklist
    assert TableFilter(blacklist=("x",)).allows("y")
    assert not TableFilter(blacklist=("X",)).allows("x")


def test_table_filter_yaml_round_trip(tmp_path):
    from sql_graph_visualizer_ray.config import TableFilter

    tf = TableFilter(
        whitelist=("customer",),
        blacklist=("part",),
        row_limit_per_table=10,
        where={"customer": (Predicate("c_acctbal", ">", 0),)},
    )
    rs = RuleSet(RULES, tables=tf)
    p = str(tmp_path / "rules.yml")
    rs.save_yaml(p)
    back = RuleSet.load_yaml(p)
    assert back.tables == tf
    assert back.rules == RULES


def test_run_rules_honors_row_limit_and_skips(ray_session):
    """row_limit_per_table caps extraction; rules over excluded tables and
    relationship rules with filtered-away endpoints are silently skipped."""
    from sql_graph_visualizer_ray.config import TableFilter
    from sql_graph_visualizer_ray.pipelines.rules import run_rules

    rs = RuleSet(
        RULES,
        tables=TableFilter(blacklist=("supplier",), row_limit_per_table=7),
    )
    outs = run_rules("/root/testdata/sf0.001", rs)
    assert "suppliers" not in outs  # blacklisted source table
    assert "supplies" not in outs  # endpoint node set filtered away
    assert outs["customers"].count() == 7  # row limit at extraction


def test_validate_flags_bad_tables_section():
    from sql_graph_visualizer_ray.config import TableFilter

    rs = RuleSet(
        RULES,
        tables=TableFilter(
            row_limit_per_table=0,
            where={"ghost": (Predicate("c", "~~", 1),)},
        ),
    )
    problems = rs.validate(known_tables={"supplier", "customer"})
    assert any("row_limit_per_table" in p for p in problems)
    assert any("'~~'" in p for p in problems)
    assert any("unknown table 'ghost'" in p for p in problems)


def test_run_rules_rejects_invalid(ray_session):
    from sql_graph_visualizer_ray.pipelines.rules import run_rules

    rs = RuleSet([RelationshipRule(name="r", relation_type="X", source_type="Nope")])
    with pytest.raises(ValueError, match="invalid rule set"):
        run_rules("/root/testdata/sf0.001", rs)


def test_load_yaml_top_level_list(tmp_path):
    """A rules file whose document is a bare YAML list of rules loads fine
    (this shape used to AttributeError on list.get)."""
    p = str(tmp_path / "rules.yml")
    with open(p, "w") as f:
        f.write(
            "- name: n1\n  rule_type: node\n  source_table: customer\n"
            "  target_type: Customer\n"
            "  field_mappings: {c_custkey: id, c_name: name}\n"
        )
    rs = RuleSet.load_yaml(p)
    assert len(rs.rules) == 1 and rs.rules[0].name == "n1"
    assert rs.validate() == []


def test_validate_flags_empty_relationship_endpoint():
    """An empty source_type/target_type would be SILENTLY skipped by
    run_rules — validate must flag it instead of passing."""
    rs = RuleSet(
        [
            NodeRule(
                name="n",
                source_table="customer",
                target_type="Customer",
                field_mappings={"c_custkey": "id"},
            ),
            RelationshipRule(
                name="r",
                source_type="",
                target_type="Customer",
                relation_type="KNOWS",
            ),
        ]
    )
    problems = rs.validate()
    assert any("empty source_type" in p for p in problems)


def test_validate_where_tables_case_insensitive():
    """tables.where keys match tables case-insensitively at RUN time
    (where_for lower-cases both sides); validate must agree instead of
    rejecting a config that executes fine."""
    from sql_graph_visualizer_ray.config import TableFilter

    rs = RuleSet(
        [
            NodeRule(
                name="n",
                source_table="customer",
                target_type="Customer",
                field_mappings={"c_custkey": "id"},
            )
        ],
        tables=TableFilter(
            where={"CUSTOMER": (Predicate("c_custkey", ">", 0),)}
        ),
    )
    assert rs.validate(known_tables=["customer"]) == []
