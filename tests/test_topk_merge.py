"""Tests for stages/util.topk_per_group — the shared coarse-key
vectorized top-k merge behind every kNN/ANN global merge."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _want(df, k, by, asc):
    out = []
    for _, g in df.groupby("query_id"):
        g = g.sort_values(by, ascending=asc, kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        out.append(g)
    return (
        pd.concat(out)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


class TestTopkPerGroup:
    def test_matches_per_group_sort_desc(self):
        import ray.data

        from geo_index_ray.stages.util import topk_per_group

        rng = np.random.default_rng(5)
        n = 20_000
        df = pd.DataFrame(
            {
                "query_id": rng.integers(0, 500, n),
                "neighbor_id": np.arange(n, dtype=np.int64),
                # heavy ties so the (sim DESC, neighbor ASC) cut matters
                "sim": rng.integers(0, 15, n).astype(np.float64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(8)
        got = (
            topk_per_group(
                ds, "query_id", 7, ["sim", "neighbor_id"], [True, False],
                ["query_id", "neighbor_id", "sim"],
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        want = _want(df, 7, ["sim", "neighbor_id"], [False, True])
        pd.testing.assert_frame_equal(
            got[["query_id", "neighbor_id", "sim", "rank"]],
            want[["query_id", "neighbor_id", "sim", "rank"]],
            check_dtype=False,
        )

    def test_matches_per_group_sort_asc(self):
        import ray.data

        from geo_index_ray.stages.util import topk_per_group

        rng = np.random.default_rng(9)
        n = 5_000
        df = pd.DataFrame(
            {
                "query_id": rng.integers(0, 40, n),
                "target_id": np.arange(n, dtype=np.int64),
                "dist": rng.integers(0, 9, n).astype(np.float64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(5)
        got = (
            topk_per_group(
                ds, "query_id", 3, ["dist", "target_id"], [False, False],
                ["query_id", "target_id", "dist"],
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        want = _want(df, 3, ["dist", "target_id"], [True, True])
        pd.testing.assert_frame_equal(
            got[["query_id", "target_id", "dist", "rank"]],
            want[["query_id", "target_id", "dist", "rank"]],
            check_dtype=False,
        )

    def test_group_smaller_than_k(self):
        import ray.data

        from geo_index_ray.stages.util import topk_per_group

        df = pd.DataFrame(
            {
                "query_id": np.array([1, 1, 2], dtype=np.int64),
                "neighbor_id": np.array([10, 11, 12], dtype=np.int64),
                "sim": np.array([0.5, 0.9, 0.1]),
            }
        )
        got = (
            topk_per_group(
                ray.data.from_pandas(df), "query_id", 5,
                ["sim", "neighbor_id"], [True, False],
                ["query_id", "neighbor_id"],
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert len(got) == 3
        assert got.loc[0, "neighbor_id"] == 11  # highest sim ranks first

    def test_int64_descending_keys_above_2_53_rank_exactly(self):
        """Descending int64 sort keys (timestamps/hash ids) must negate
        in-dtype: a float64 cast collapses magnitudes above 2^53 and
        mis-ranks (the ADVICE-r3 trap)."""
        import ray.data

        from geo_index_ray.stages.util import topk_per_group

        base = (1 << 61) + 1
        # three consecutive huge ids in one group: float64 would see all
        # three as EQUAL and rank arbitrarily
        df = pd.DataFrame(
            {
                "g": np.array([7, 7, 7, 8], dtype=np.int64),
                "ts": np.array(
                    [base, base + 2, base + 1, base], dtype=np.int64
                ),
                "row": np.array([0, 1, 2, 3], dtype=np.int64),
            }
        )
        got = (
            topk_per_group(
                ray.data.from_pandas(df), "g", 2,
                ["ts", "row"], [True, False], ["g", "ts", "row"],
            )
            .to_pandas()
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        g7 = got[got["g"] == 7].reset_index(drop=True)
        assert g7["ts"].tolist() == [base + 2, base + 1]  # exact desc order
        assert g7["row"].tolist() == [1, 2]
        assert int(got[got["g"] == 8]["ts"].iloc[0]) == base
