"""stages.pairjoin: distributed candidate-pair payload verification."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _make_payload(ids):  # local data builder (driver side only)
    return pa.table(
        {
            "id": pa.array(np.asarray(ids, dtype=np.int64)),
            "vec": pa.array([[float(i), float(i * 2)] for i in ids],
                            pa.list_(pa.float64())),
        }
    )


def _sum_reducer_factory():
    import numpy as _np
    import pyarrow as _pa

    def _sum_reducer(a, b, apay, bpay):
        if len(a) == 0:
            return _pa.table(
                {
                    "a_id": _pa.array([], _pa.int64()),
                    "b_id": _pa.array([], _pa.int64()),
                    "s": _pa.array([], _pa.float64()),
                }
            )
        av = apay.flatten().to_numpy(zero_copy_only=False).reshape(len(a), 2)
        bv = bpay.flatten().to_numpy(zero_copy_only=False).reshape(len(b), 2)
        return _pa.table(
            {
                "a_id": _pa.array(a),
                "b_id": _pa.array(b),
                "s": _pa.array(av.sum(axis=1) + bv.sum(axis=1)),
            }
        )

    return _sum_reducer


class TestVerifyPairs:
    def test_attaches_both_payloads_and_dedups(self):
        import ray.data

        from geo_index_ray.stages import pairjoin

        ids = np.arange(50, dtype=np.int64)
        payload = ray.data.from_arrow(_make_payload(ids))
        # duplicate pairs (as LSH bands would emit) must come out once
        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "a_id": pa.array([1, 1, 2, 7, 7, 7], pa.int64()),
                    "b_id": pa.array([3, 3, 9, 8, 8, 8], pa.int64()),
                }
            )
        )
        out = pairjoin.verify_pairs(
            pairs, payload, "id", "vec", pa.list_(pa.float64()), _sum_reducer_factory()
        ).to_pandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
        want = pd.DataFrame(
            {
                "a_id": [1, 2, 7],
                "b_id": [3, 9, 8],
                "s": [
                    (1 + 2) + (3 + 6.0),
                    (2 + 4) + (9 + 18.0),
                    (7 + 14) + (8 + 16.0),
                ],
            }
        )
        pd.testing.assert_frame_equal(out, want)

    def test_missing_payload_id_drops_pair(self):
        import ray.data

        from geo_index_ray.stages import pairjoin

        payload = ray.data.from_arrow(_make_payload(np.arange(10, dtype=np.int64)))
        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "a_id": pa.array([1, 2, 999], pa.int64()),
                    "b_id": pa.array([3, 999, 5], pa.int64()),
                }
            )
        )
        out = pairjoin.verify_pairs(
            pairs, payload, "id", "vec", pa.list_(pa.float64()), _sum_reducer_factory()
        ).to_pandas()
        assert sorted(zip(out.a_id, out.b_id)) == [(1, 3)]

    def test_bloom_has_no_false_negatives(self):
        from geo_index_ray.stages import pairjoin

        rng = np.random.default_rng(0)
        members = rng.integers(0, 2**62, 10000)
        bits = np.zeros(pairjoin._BLOOM_BITS // 8, dtype=np.uint8)
        for p in pairjoin._bloom_positions(members):
            np.bitwise_or.at(bits, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8))
        assert pairjoin._bloom_contains(bits, members).all()
        others = rng.integers(0, 2**62, 10000)
        fp = pairjoin._bloom_contains(
            bits, others[~np.isin(others, members)]
        ).mean()
        assert fp < 0.01
