"""negative_samples — deterministic anti-membership sampling vs SQL."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.ranking import (
    _NS_A,
    _NS_B,
    _NS_MOD,
    negative_samples,
    sql_negative_samples,
)


def _run(ray_session, pos, n_items, k, m_factor=4):
    import ray.data

    ds = ray.data.from_pandas(pos).repartition(3)
    out = (
        negative_samples(ds, "u", "it", n_items, k, m_factor)
        .to_pandas()
        .sort_values(["u", "rnk"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("p", pos)
    ora = (
        con.sql(
            sql_negative_samples(
                "SELECT u, it FROM p", "u", "it",
                str(n_items), k, m_factor,
            )
            + " ORDER BY u, rnk"
        )
        .df()
        .astype(out.dtypes)
    )
    pd.testing.assert_frame_equal(out, ora)
    return out


class TestNegativeSamples:
    def test_matches_sql_twin(self, ray_session):
        rng = np.random.default_rng(21)
        pos = pd.DataFrame(
            {
                "u": rng.integers(1, 40, 300).astype(np.int64),
                "it": rng.integers(1, 50, 300).astype(np.int64),
            }
        )
        out = _run(ray_session, pos, n_items=50, k=5)
        # no sampled pair is a positive
        bad = out.merge(pos.drop_duplicates(), on=["u", "it"], how="inner")
        assert len(bad) == 0
        assert (out.groupby("u")["rnk"].max() <= 5).all()
        assert (out.groupby("u").size() <= 5).all()

    def test_deterministic_across_layouts(self, ray_session):
        import ray.data

        rng = np.random.default_rng(22)
        pos = pd.DataFrame(
            {
                "u": rng.integers(1, 25, 200).astype(np.int64),
                "it": rng.integers(1, 30, 200).astype(np.int64),
            }
        )
        a = _run(ray_session, pos, n_items=30, k=3)
        ds = ray.data.from_pandas(pos).repartition(9)
        b = (
            negative_samples(ds, "u", "it", 30, 3)
            .to_pandas()
            .sort_values(["u", "rnk"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_saturated_user_yields_fewer(self, ray_session):
        # user 1 owns ALL items (0-based id space): zero negatives
        # exist; user 2 owns only item 1
        n_items = 6
        pos = pd.DataFrame(
            {
                "u": np.r_[np.ones(n_items, np.int64), [2]],
                "it": np.r_[np.arange(n_items, dtype=np.int64), [1]],
            }
        )
        out = _run(ray_session, pos, n_items=n_items, k=4)
        assert 1 not in set(out["u"])
        got = out[out["u"] == 2]
        assert 1 <= len(got) <= 4
        # LCG regeneration check for user 2's first survivor
        slots = np.arange(16, dtype=np.int64)
        cand = ((2 * _NS_A + (slots + 1) * _NS_B) % _NS_MOD) % n_items
        first_neg = cand[cand != 1][0]
        assert got.iloc[0]["it"] == first_neg

    def test_one_based_data_ids_no_alias(self, ray_session):
        # data item ids 1..n_items (positive it == n_items legal): the
        # stride-(n_items+1) packing must not alias user u+1's item 0
        n_items = 6
        pos = pd.DataFrame(
            {
                "u": np.array([1, 2], dtype=np.int64),
                "it": np.array([n_items, 1], dtype=np.int64),
            }
        )
        _run(ray_session, pos, n_items=n_items, k=4)

    def test_packed_key_no_cross_user_alias(self, ray_session):
        # round-5 regression: candidate items are 0-based (same dense id
        # space as the data) so u*n_items+item cannot alias the next
        # user's item 0 — a 1-based range dropped candidate (u, n_items)
        # whenever positive (u+1, 0) existed
        pos = pd.DataFrame(
            {
                "u": np.array([84, 85], dtype=np.int64),
                "it": np.array([3, 0], dtype=np.int64),
            }
        )
        out = _run(ray_session, pos, n_items=200, k=5)
        # every candidate the LCG generates for u=84 that is not a
        # positive of u=84 must survive, regardless of user 85's rows
        m = 20
        slots = np.arange(m, dtype=np.int64)
        items = ((84 * _NS_A + (slots + 1) * _NS_B) % _NS_MOD) % 200
        first = {}
        for s, it in zip(slots.tolist(), items.tolist()):
            first.setdefault(it, s)
        expect = sorted(
            (s, it) for it, s in first.items() if it != 3
        )[:5]
        got = out[out.u == 84][["slot", "it"]].values.tolist()
        assert got == [[s, it] for s, it in expect]
