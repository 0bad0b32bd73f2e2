"""KDTree kernel parity tests (FIXTURES.md F2, F4)."""

import numpy as np
import pytest

from geo_index_ray.kernels import kdtree
from fixtures.kdbush_points import (
    POINTS,
    EXPECTED_IDS,
    EXPECTED_COORDS,
    EXPECTED_RANGE_2030_5070,
    EXPECTED_WITHIN_50_50_20,
)


def point_arrays():
    x = np.array([p[0] for p in POINTS], dtype=np.float64)
    y = np.array([p[1] for p in POINTS], dtype=np.float64)
    return x, y


def parity_tree():
    x, y = point_arrays()
    return kdtree.build_kdtree(x, y, node_size=10, parity=True)


class TestParity:
    def test_kd_sorted_ids_and_coords(self):
        # golden permutation from src/kdtree/test.rs:115-138
        buf = parity_tree()
        meta = kdtree.KDTreeMetadata.from_buffer(buf)
        assert meta.ids_view(buf).tolist() == EXPECTED_IDS
        assert meta.coords_view(buf).tolist() == [float(c) for c in EXPECTED_COORDS]

    def test_header(self):
        buf = parity_tree()
        assert buf[0] == 0xDB
        assert buf[1] == (1 << 4) | 8
        assert int(buf[2:4].view(np.uint16)[0]) == 10
        assert int(buf[4:8].view(np.uint32)[0]) == 100

    def test_metadata_sizes(self):
        # doc examples: src/kdtree/index.rs:108-113 and kdtree.pyi:184-191
        assert kdtree.KDTreeMetadata(25_000, 16).data_buffer_length == 450_008
        assert kdtree.KDTreeMetadata(1_000_000, 64).data_buffer_length == 20_000_008

    def test_range_golden_order(self):
        buf = parity_tree()
        got = kdtree.range_query(buf, 20, 30, 50, 70)
        assert got.tolist() == EXPECTED_RANGE_2030_5070

    def test_within_golden_order(self):
        buf = parity_tree()
        got = kdtree.within(buf, 50, 50, 20)
        assert got.tolist() == EXPECTED_WITHIN_50_50_20


class TestCrossCheck:
    @pytest.mark.parametrize("parity", [True, False])
    def test_range_brute_force(self, parity):
        x, y = point_arrays()
        buf = kdtree.build_kdtree(x, y, node_size=10, parity=parity)
        got = set(kdtree.range_query(buf, 20, 30, 50, 70).tolist())
        expected = {
            i for i, (px, py) in enumerate(POINTS) if 20 <= px <= 50 and 30 <= py <= 70
        }
        assert got == expected

    @pytest.mark.parametrize("parity", [True, False])
    def test_within_brute_force(self, parity):
        x, y = point_arrays()
        buf = kdtree.build_kdtree(x, y, node_size=10, parity=parity)
        got = set(kdtree.within(buf, 50, 50, 20).tolist())
        expected = {
            i
            for i, (px, py) in enumerate(POINTS)
            if (px - 50) ** 2 + (py - 50) ** 2 <= 400
        }
        assert got == expected

    def test_batch_matches_scalar(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 100, 2000)
        y = rng.uniform(0, 100, 2000)
        buf = kdtree.build_kdtree(x, y, node_size=16)
        qx = rng.uniform(0, 100, 40)
        qy = rng.uniform(0, 100, 40)
        qid, iid = kdtree.range_batch(buf, qx - 5, qy - 5, qx + 5, qy + 5)
        got = set(zip(qid.tolist(), iid.tolist()))
        expected = set()
        for q in range(40):
            for i in kdtree.range_query(buf, qx[q] - 5, qy[q] - 5, qx[q] + 5, qy[q] + 5):
                expected.add((q, int(i)))
        assert got == expected

        qid, iid = kdtree.within_batch(buf, qx, qy, np.full(40, 7.0))
        got = set(zip(qid.tolist(), iid.tolist()))
        expected = set()
        for q in range(40):
            for i in kdtree.within(buf, qx[q], qy[q], 7.0):
                expected.add((q, int(i)))
        assert got == expected


class TestThresholds:
    def test_u32_ids_above_65536(self):
        assert kdtree.KDTreeMetadata(65_535, 64).indices_dtype == np.dtype(np.uint16)
        assert kdtree.KDTreeMetadata(65_536, 64).indices_dtype == np.dtype(np.uint32)
        n = 70_000
        rng = np.random.default_rng(1)
        x = rng.uniform(0, 1000, n)
        y = rng.uniform(0, 1000, n)
        buf = kdtree.build_kdtree(x, y)
        meta = kdtree.KDTreeMetadata.from_buffer(buf)
        assert meta.indices_dtype == np.dtype(np.uint32)
        got = set(kdtree.range_query(buf, 10, 10, 20, 20).tolist())
        expected = set(np.nonzero((x >= 10) & (x <= 20) & (y >= 10) & (y <= 20))[0].tolist())
        assert got == expected

    @pytest.mark.parametrize("n", [3, 4, 5, 100, 101])
    def test_coord_padding_alignment(self, n):
        # odd num_items exercise the (8 - indices%8) % 8 padding
        # (src/kdtree/index.rs:32)
        meta = kdtree.KDTreeMetadata(n, 4)
        assert (meta.indices_byte_size + meta.pad_coords_byte_size) % 8 == 0
        x = np.arange(n, dtype=np.float64)
        buf = kdtree.build_kdtree(x, x, node_size=4)
        for i in range(n):
            assert kdtree.range_query(buf, i, i, i, i).tolist() == [i]

    def test_rejects_bad_buffers(self):
        with pytest.raises(ValueError):
            kdtree.KDTreeMetadata.from_buffer(b"")
        with pytest.raises(ValueError):
            kdtree.KDTreeMetadata.from_buffer(bytes(7))
        buf = parity_tree().tobytes()
        with pytest.raises(ValueError):
            kdtree.KDTreeMetadata.from_buffer(b"\x00" + buf[1:])
        with pytest.raises(ValueError):
            kdtree.KDTreeMetadata.from_buffer(buf[:-2])
