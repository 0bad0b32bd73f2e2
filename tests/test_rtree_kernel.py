"""RTree kernel parity tests (FIXTURES.md F1, F3, F4, F5)."""

import hashlib
import os

import numpy as np
import pytest

from geo_index_ray.kernels import rtree
from fixtures.data1 import DATA1, SEARCH_40_60_EXPECTED

REF_INPUT = "/root/reference/fixtures/data1_input.raw"
REF_JS = "/root/reference/fixtures/data1_flatbush_js.raw"

# sha256 of the flatbush-JS buffer for the 100-box fixture (node_size 16,
# f64, hilbert) so the parity pin also holds without the reference checkout.
FLATBUSH_JS_SHA256 = "a1c50be4100af334dd8eb0e4d17c624d5e0e81ba2d18e0806974f33abea47530"


def data1_boxes():
    arr = np.array(DATA1, dtype=np.float64).reshape(-1, 4)
    return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]


def build_data1(method="hilbert_parity"):
    mnx, mny, mxx, mxy = data1_boxes()
    return rtree.build_rtree(mnx, mny, mxx, mxy, node_size=16, method=method)


class TestByteParity:
    def test_parity_build_matches_flatbush_js_sha(self):
        buf = build_data1()
        assert hashlib.sha256(buf.tobytes()).hexdigest() == FLATBUSH_JS_SHA256

    @pytest.mark.skipif(not os.path.exists(REF_JS), reason="reference fixture absent")
    def test_parity_build_matches_flatbush_js_bytes(self):
        buf = build_data1()
        expected = np.fromfile(REF_JS, dtype=np.uint8)
        assert np.array_equal(buf, expected)

    @pytest.mark.skipif(not os.path.exists(REF_INPUT), reason="reference fixture absent")
    def test_transcribed_fixture_matches_reference_input(self):
        raw = np.fromfile(REF_INPUT, dtype=np.float64)
        assert raw.tolist() == [float(v) for v in DATA1]

    def test_header(self):
        buf = build_data1()
        assert buf[0] == 0xFB
        assert buf[1] == (3 << 4) | 8
        assert int(buf[2:4].view(np.uint16)[0]) == 16
        assert int(buf[4:8].view(np.uint32)[0]) == 100

    def test_metadata_sizes(self):
        # doc example: 25_000 items @ node_size 16, f64 → 960_092 bytes
        # (src/rtree/index.rs:125-130)
        assert rtree.RTreeMetadata(25_000, 16).data_buffer_length == 960_092
        # 1M items @ node_size 20 → 37_894_796 (rtree.pyi:228-235)
        assert rtree.RTreeMetadata(1_000_000, 20).data_buffer_length == 37_894_796


class TestSearch:
    def test_golden_bbox_search(self):
        # src/rtree/trait.rs:588-610
        mnx, mny, mxx, mxy = data1_boxes()
        arr = np.array(DATA1, dtype=np.float64).reshape(-1, 4)
        for method in ("hilbert_parity", "hilbert", "str", "str_parity"):
            buf = rtree.build_rtree(mnx, mny, mxx, mxy, node_size=16, method=method)
            ids = rtree.search(buf, 40, 40, 60, 60)
            got = sorted(np.concatenate([arr[i] for i in ids]).tolist())
            assert got == SEARCH_40_60_EXPECTED, method

    def test_search_batch_matches_brute_force(self):
        rng = np.random.default_rng(42)
        n = 500
        mnx = rng.uniform(0, 100, n)
        mny = rng.uniform(0, 100, n)
        mxx = mnx + rng.uniform(0, 5, n)
        mxy = mny + rng.uniform(0, 5, n)
        buf = rtree.build_rtree(mnx, mny, mxx, mxy, node_size=10)
        qmnx = rng.uniform(0, 100, 50)
        qmny = rng.uniform(0, 100, 50)
        qmxx = qmnx + rng.uniform(0, 20, 50)
        qmxy = qmny + rng.uniform(0, 20, 50)
        qids, iids = rtree.search_batch(buf, qmnx, qmny, qmxx, qmxy)
        got = set(zip(qids.tolist(), iids.tolist()))
        expected = set()
        for q in range(50):
            hit = ~(
                (qmxx[q] < mnx) | (qmxy[q] < mny) | (qmnx[q] > mxx) | (qmny[q] > mxy)
            )
            for i in np.nonzero(hit)[0]:
                expected.add((q, int(i)))
        assert got == expected


class TestKNN:
    def test_knn_ordering(self):
        # F3 / src/rtree/trait.rs:184-197
        buf = rtree.build_rtree(
            np.array([0.0, 1, 2]), np.array([0.0, 1, 2]), np.array([2.0, 3, 4]), np.array([2.0, 3, 4])
        )
        assert rtree.neighbors(buf, 5, 5).tolist() == [2, 1, 0]

    def test_max_distance_euclidean(self):
        # F3 / src/rtree/trait.rs:670-684 (EuclideanDistance metric)
        buf = rtree.build_rtree(
            np.array([0.0, 2, 10]), np.array([0.0, 2, 10]), np.array([1.0, 3, 11]), np.array([1.0, 3, 11])
        )
        assert rtree.neighbors(buf, 0, 0, max_distance=5, metric="euclidean").tolist() == [0, 1]
        # default metric is squared distance → only item 0 within 5
        assert rtree.neighbors(buf, 0, 0, max_distance=5).tolist() == [0]

    def test_haversine_ordering(self):
        # NY, London, Tokyo (src/rtree/trait.rs:636-648)
        lons = np.array([-74.0, -0.1, 139.7])
        lats = np.array([40.7, 51.5, 35.7])
        buf = rtree.build_rtree(lons, lats, lons, lats)
        assert rtree.neighbors(buf, -74.0, 40.7, metric="haversine").tolist() == [0, 1, 2]

    def test_knn_matches_brute_force(self):
        rng = np.random.default_rng(7)
        n = 300
        x = rng.uniform(0, 100, n)
        y = rng.uniform(0, 100, n)
        buf = rtree.build_rtree(x, y, x, y, node_size=16)
        for qx, qy in [(50, 50), (0, 0), (99, 1)]:
            got = rtree.neighbors(buf, qx, qy, max_results=10)
            d = (x - qx) ** 2 + (y - qy) ** 2
            expected = np.argsort(d, kind="stable")[:10]
            assert set(got.tolist()) == set(expected.tolist())


class TestDegenerate:
    @pytest.mark.parametrize("method", ["hilbert", "str", "hilbert_parity", "str_parity"])
    @pytest.mark.parametrize("num_items", [0, 1, 4, 8, 16, 20, 40, 80])
    def test_various_sizes_self_query(self, num_items, method):
        # src/rtree/builder.rs:261-301
        vals = np.arange(num_items, dtype=np.float64)
        buf = rtree.build_rtree(vals, vals, vals, vals, method=method)
        meta = rtree.RTreeMetadata.from_buffer(buf)
        assert meta.num_items == num_items
        if num_items == 0:
            assert len(rtree.search(buf, 0, 0, 0, 0)) == 0
        else:
            for i in range(num_items):
                assert rtree.search(buf, i, i, i, i).tolist() == [i]

    def test_imbalanced_duplicates(self):
        # src/rtree/index.rs:243-268
        n = 15000
        items = np.linspace(0, 1000, n)
        mnx = np.concatenate([items, items])
        z = np.zeros(2 * n)
        for method in ("hilbert", "str"):
            buf = rtree.build_rtree(mnx, z, mnx, z, method=method)
            ids = rtree.search(buf, -100, -1, 15000, 1)
            assert len(ids) == 2 * n

    def test_u32_indices_threshold(self):
        # num_nodes >= 16384 switches indices to u32 (src/indices.rs:16-22)
        small = rtree.RTreeMetadata(15000, 16)
        assert small.indices_dtype == np.dtype(np.uint16)
        big = rtree.RTreeMetadata(16000, 16)
        assert big.num_nodes >= 16384
        assert big.indices_dtype == np.dtype(np.uint32)
        n = 16500
        x = np.arange(n, dtype=np.float64)
        buf = rtree.build_rtree(x, x, x, x)
        assert rtree.search(buf, 7777, 7777, 7777, 7777).tolist() == [7777]

    def test_rejects_bad_buffers(self):
        with pytest.raises(ValueError):
            rtree.RTreeMetadata.from_buffer(b"")
        with pytest.raises(ValueError):
            rtree.RTreeMetadata.from_buffer(bytes(7))
        buf = build_data1().tobytes()
        with pytest.raises(ValueError):
            rtree.RTreeMetadata.from_buffer(b"\x00" + buf[1:])  # bad magic
        with pytest.raises(ValueError):
            rtree.RTreeMetadata.from_buffer(buf[:-1])  # bad length
        bad_version = bytearray(buf)
        bad_version[1] = (2 << 4) | 8
        with pytest.raises(ValueError):
            rtree.RTreeMetadata.from_buffer(bytes(bad_version))


class TestJoin:
    def test_tree_join_matches_brute_force(self):
        # F5: seeded overlapping boxes, candidate set == O(n²) scan
        rng = np.random.default_rng(99)
        def mk(n):
            cx = rng.uniform(0, 100, n)
            cy = rng.uniform(0, 100, n)
            r = rng.uniform(1, 10, n)
            return cx - r, cy - r, cx + r, cy + r
        la, lb, lc, ld = mk(100)
        ra, rb, rc, rd = mk(85)
        lt = rtree.build_rtree(la, lb, lc, ld, node_size=10)
        rt = rtree.build_rtree(ra, rb, rc, rd, node_size=10)
        li, ri = rtree.tree_join(lt, rt)
        got = set(zip(li.tolist(), ri.tolist()))
        expected = set()
        for i in range(100):
            hit = ~((rc < la[i]) | (rd < lb[i]) | (ra > lc[i]) | (rb > ld[i]))
            for j in np.nonzero(hit)[0]:
                expected.add((i, int(j)))
        assert got == expected

    def test_self_join_contains_diagonal(self):
        mnx, mny, mxx, mxy = data1_boxes()
        buf = rtree.build_rtree(mnx, mny, mxx, mxy, node_size=10)
        li, ri = rtree.tree_join(buf, buf)
        pairs = set(zip(li.tolist(), ri.tolist()))
        for i in range(100):
            assert (i, i) in pairs


class TestPartitions:
    def test_partitions_cover_all_items(self):
        mnx, mny, mxx, mxy = data1_boxes()
        buf = rtree.build_rtree(mnx, mny, mxx, mxy, node_size=16)
        idx, pids = rtree.partitions(buf)
        assert sorted(idx.tolist()) == list(range(100))
        assert pids.max() == (100 - 1) // 16
        boxes = rtree.partition_boxes(buf)
        assert boxes.shape == (int(np.ceil(100 / 16)), 4)
        # every item's box is inside its partition envelope
        for i, p in zip(idx.tolist(), pids.tolist()):
            env = boxes[p]
            assert env[0] <= mnx[i] and env[1] <= mny[i]
            assert env[2] >= mxx[i] and env[3] >= mxy[i]

    def test_boxes_at_level_root_is_global_bbox(self):
        mnx, mny, mxx, mxy = data1_boxes()
        buf = rtree.build_rtree(mnx, mny, mxx, mxy, node_size=16)
        meta = rtree.RTreeMetadata.from_buffer(buf)
        root = rtree.boxes_at_level(buf, meta.num_levels - 1)
        assert root.shape == (1, 4)
        assert root[0].tolist() == [mnx.min(), mny.min(), mxx.max(), mxy.max()]


class TestF32:
    def test_f32_build_and_search(self):
        mnx, mny, mxx, mxy = data1_boxes()
        buf = rtree.build_rtree(mnx, mny, mxx, mxy, node_size=16, dtype=np.float32)
        assert buf[1] == (3 << 4) | 7
        arr = np.array(DATA1, dtype=np.float64).reshape(-1, 4)
        ids = rtree.search(buf, 40, 40, 60, 60)
        got = sorted(np.concatenate([arr[i] for i in ids]).tolist())
        assert got == SEARCH_40_60_EXPECTED


class TestNaNContract:
    def test_rtree_rejects_nan(self):
        import pytest

        from geo_index_ray.kernels import rtree

        x = np.array([1.0, np.nan, 3.0])
        with pytest.raises(ValueError, match="NaN"):
            rtree.build_rtree(x, x, x, x)

    def test_kdtree_rejects_nan(self):
        import pytest

        from geo_index_ray.kernels import kdtree

        x = np.array([1.0, 2.0])
        y = np.array([np.nan, 2.0])
        with pytest.raises(ValueError, match="NaN"):
            kdtree.build_kdtree(x, y)


class TestIntegerCoordTypes:
    """Reference-core parity: integer coordinate types beyond the Python
    bindings' f32/f64 subset (reference src/type.rs:15-85)."""

    def test_int_tree_roundtrip_and_search(self):
        from geo_index_ray.kernels import rtree

        rng = np.random.default_rng(5)
        for dt in (np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32):
            info = np.iinfo(dt)
            lo = max(info.min, -100)
            hi = min(info.max, 100)
            n = 300
            x0 = rng.integers(lo, hi - 5, n).astype(dt)
            y0 = rng.integers(lo, hi - 5, n).astype(dt)
            x1 = (x0 + rng.integers(0, 5, n).astype(dt)).astype(dt)
            y1 = (y0 + rng.integers(0, 5, n).astype(dt)).astype(dt)
            buf = rtree.build_rtree(x0, y0, x1, y1, dtype=dt)
            # header nibble encodes the dtype; reattach round-trips it
            meta, boxes, _ = rtree._attach(buf)
            assert boxes.dtype == np.dtype(dt)
            qx0, qy0, qx1, qy1 = lo + 10, lo + 10, lo + 40, lo + 40
            hits = np.sort(rtree.search(buf, qx0, qy0, qx1, qy1))
            brute = np.sort(
                np.nonzero(
                    (x0.astype(np.int64) <= qx1)
                    & (x1.astype(np.int64) >= qx0)
                    & (y0.astype(np.int64) <= qy1)
                    & (y1.astype(np.int64) >= qy0)
                )[0]
            )
            assert np.array_equal(hits, brute), dt

    def test_int_tree_neighbors(self):
        from geo_index_ray.kernels import rtree

        rng = np.random.default_rng(6)
        x = rng.integers(0, 1000, 500).astype(np.uint32)
        y = rng.integers(0, 1000, 500).astype(np.uint32)
        buf = rtree.build_rtree(x, y, x, y, dtype=np.uint32)
        nb = rtree.neighbors(buf, 500.0, 500.0, max_results=5)
        d = (x.astype(np.float64) - 500.0) ** 2 + (y.astype(np.float64) - 500.0) ** 2
        want = set(np.argsort(d, kind="stable")[:5].tolist())
        assert set(nb.tolist()) <= set(np.nonzero(d <= np.sort(d)[4])[0].tolist())
        assert len(nb) == 5
