"""Market-basket analysis: frequent itemsets + association rules."""

from __future__ import annotations

import math

import pytest

from temporal_retriever_spark.basket import association_rules, frequent_itemsets

# 8 baskets over items {a, b, c, d}; d appears once (infrequent at 0.3)
BASKETS = [
    (1, "a"), (1, "b"),
    (2, "a"), (2, "b"), (2, "c"),
    (3, "a"), (3, "b"),
    (4, "a"),
    (5, "b"), (5, "c"),
    (6, "c"),
    (7, "a"), (7, "c"),
    (8, "d"),
    # duplicate line inside a basket: must count once
    (3, "a"),
]


@pytest.fixture(scope="module")
def basket_df(spark):
    return spark.createDataFrame(BASKETS, ["basket", "item"])


def _sets(df):
    return {
        (r["size"], r["item_a"], r["item_b"]): (r["support_count"], r["support"])
        for r in df.collect()
    }


class TestFrequentItemsets:
    def test_counts_match_hand_computation(self, basket_df):
        got = _sets(
            frequent_itemsets(
                basket_df, basket_col="basket", item_col="item", min_support=0.25
            )
        )
        # N = 8 baskets; a:5 b:4 c:4 d:1; ab:3 ac:2 bc:2
        assert got[(1, "a", None)] == (5, 5 / 8)
        assert got[(1, "b", None)] == (4, 4 / 8)
        assert got[(1, "c", None)] == (4, 4 / 8)
        assert (1, "d", None) not in got  # 1/8 < 0.25
        assert got[(2, "a", "b")] == (3, 3 / 8)
        assert got[(2, "a", "c")] == (2, 2 / 8)
        assert got[(2, "b", "c")] == (2, 2 / 8)
        assert len(got) == 6

    def test_apriori_prune_excludes_infrequent_member_pairs(self, basket_df):
        got = _sets(
            frequent_itemsets(
                basket_df, basket_col="basket", item_col="item", min_support=0.5
            )
        )
        # at 0.5 only a (5/8) and b,c (4/8) survive as singles; no pair
        # reaches 4 baskets
        assert set(got) == {(1, "a", None), (1, "b", None), (1, "c", None)}

    def test_max_basket_items_drops_mega_baskets(self, basket_df):
        got = _sets(
            frequent_itemsets(
                basket_df,
                basket_col="basket",
                item_col="item",
                min_support=0.2,
                max_basket_items=2,
            )
        )
        # basket 2 (a,b,c) is dropped entirely: N = 7, ab count falls to 2
        assert got[(2, "a", "b")] == (2, 2 / 7)
        assert (2, "a", "c") not in got  # only basket 7 left: 1/7 < 0.2

    def test_validation(self, basket_df):
        with pytest.raises(ValueError):
            frequent_itemsets(
                basket_df, basket_col="basket", item_col="item", min_support=0.0
            )
        with pytest.raises(ValueError):
            frequent_itemsets(
                basket_df,
                basket_col="basket",
                item_col="item",
                max_basket_items=0,
            )


class TestAssociationRules:
    def test_rule_arithmetic(self, basket_df):
        rules = {
            (r["antecedent"], r["consequent"]): r
            for r in association_rules(
                basket_df, basket_col="basket", item_col="item", min_support=0.25
            ).collect()
        }
        ab = rules[("a", "b")]
        # conf(a→b) = 3/5, lift = (3/5) / (4/8) = 1.2
        assert ab["support_count"] == 3
        assert math.isclose(ab["confidence"], 3 / 5)
        assert math.isclose(ab["lift"], (3 / 5) / (4 / 8))
        ba = rules[("b", "a")]
        # conf(b→a) = 3/4, lift identical by symmetry
        assert math.isclose(ba["confidence"], 3 / 4)
        assert math.isclose(ba["lift"], ab["lift"])
        # both orientations of every frequent pair present
        assert len(rules) == 6

    def test_min_confidence_filters(self, basket_df):
        rules = association_rules(
            basket_df,
            basket_col="basket",
            item_col="item",
            min_support=0.25,
            min_confidence=0.7,
        ).collect()
        kept = {(r["antecedent"], r["consequent"]) for r in rules}
        assert ("b", "a") in kept  # 0.75
        assert ("a", "b") not in kept  # 0.6

    def test_lift_detects_negative_association(self, spark):
        # x and y never co-occur with z beyond chance: lift < 1
        rows = []
        for b in range(10):
            rows.append((b, "x"))
            rows.append((b, "y"))
        for b in range(10, 12):
            rows.append((b, "x"))
            rows.append((b, "z"))
        for b in range(12, 20):
            rows.append((b, "z"))
        df = spark.createDataFrame(rows, ["basket", "item"])
        rules = {
            (r["antecedent"], r["consequent"]): r
            for r in association_rules(
                df, basket_col="basket", item_col="item", min_support=0.1
            ).collect()
        }
        # conf(x→z) = 2/12, P(z) = 10/20 → lift = (1/6)/(1/2) < 1
        assert rules[("x", "z")]["lift"] < 1.0
        # conf(x→y) = 10/12, P(y) = 10/20 → lift > 1
        assert rules[("x", "y")]["lift"] > 1.0
