"""group_diameter — hull-pruned farthest pair vs brute force."""

import numpy as np
import pandas as pd
import pytest

from geo_index_ray.pipelines.geoanalytics import _monotone_chain, group_diameter


def _brute(df):
    rows = []
    for k, sub in df.groupby("k"):
        dx = sub["mx"].to_numpy()[:, None] - sub["mx"].to_numpy()[None, :]
        dy = sub["my"].to_numpy()[:, None] - sub["my"].to_numpy()[None, :]
        rows.append((k, int((dx * dx + dy * dy).max())))
    return pd.DataFrame(rows, columns=["k", "diam_sq"]).astype(np.int64)


def _run(ray_session, df):
    import ray.data

    out = (
        group_diameter(ray.data.from_pandas(df).repartition(5), "k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(out, _brute(df).sort_values("k").reset_index(drop=True))
    return out


class TestMonotoneChain:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_hull_contains_farthest_pair(self, seed):
        rng = np.random.default_rng(seed)
        x = rng.integers(0, 1000, 200).astype(np.int64)
        y = rng.integers(0, 1000, 200).astype(np.int64)
        order = np.lexsort((y, x))
        x, y = x[order], y[order]
        h = _monotone_chain(x, y)
        dxa = x[:, None] - x[None, :]
        dya = y[:, None] - y[None, :]
        full = (dxa * dxa + dya * dya).max()
        dxh = x[h][:, None] - x[h][None, :]
        dyh = y[h][:, None] - y[h][None, :]
        assert (dxh * dxh + dyh * dyh).max() == full

    def test_collinear_degenerates_to_segment(self):
        x = np.arange(10, dtype=np.int64)
        y = 2 * x + 1
        h = _monotone_chain(x, y)
        assert len(h) == 2  # interior collinear points dropped


class TestGroupDiameter:
    def test_random_matches_brute(self, ray_session):
        rng = np.random.default_rng(7)
        n = 600
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 8, n).astype(np.int64),
                "mx": rng.integers(0, 360_000, n).astype(np.int64),
                "my": rng.integers(0, 170_000, n).astype(np.int64),
            }
        )
        _run(ray_session, df)

    def test_degenerate_groups(self, ray_session):
        df = pd.DataFrame(
            {
                # k=1 singleton, k=2 duplicate point, k=3 vertical line
                "k": np.array([1, 2, 2, 3, 3, 3], np.int64),
                "mx": np.array([5, 9, 9, 4, 4, 4], np.int64),
                "my": np.array([5, 2, 2, 0, 10, 20], np.int64),
            }
        )
        out = _run(ray_session, df).set_index("k")
        assert out.loc[1, "diam_sq"] == 0
        assert out.loc[2, "diam_sq"] == 0
        assert out.loc[3, "diam_sq"] == 400
