"""rstar-parity self-join on the reference's real-geometry fixture.

The reference validates its dual-tree intersection candidates against
rstar on the 116-polygon Guerry departments GeoJSON
(src/rtree/traversal.rs:402-484, fixtures/issue_42.geojson.zip — public
data, copied verbatim as fixture DATA, not code).  Here the ground truth
is the brute-force O(n²) bbox-intersection pair set (what rstar's
candidate enumeration computes for bounding rectangles).
"""

import json
import os
import zipfile

import numpy as np

from geo_index_ray.kernels import rtree

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "issue_42.geojson.zip")


def _load_bboxes() -> np.ndarray:
    with zipfile.ZipFile(FIXTURE) as z:
        fc = json.load(z.open("guerry.geojson"))
    boxes = []
    for feat in fc["features"]:
        geom = feat["geometry"]
        assert geom["type"] == "Polygon"
        ring = np.asarray(geom["coordinates"][0], dtype=np.float64)
        boxes.append(
            [ring[:, 0].min(), ring[:, 1].min(), ring[:, 0].max(), ring[:, 1].max()]
        )
    return np.asarray(boxes)


def test_issue_42_self_join_matches_brute_force():
    b = _load_bboxes()
    assert len(b) == 116

    # same node_size as the reference's regression test (traversal.rs:439)
    buf = rtree.build_rtree(b[:, 0], b[:, 1], b[:, 2], b[:, 3], node_size=10)
    li, ri = rtree.tree_join(buf, buf)
    got = set(zip(li.tolist(), ri.tolist()))

    inter = (
        (b[:, None, 0] <= b[None, :, 2])
        & (b[:, None, 2] >= b[None, :, 0])
        & (b[:, None, 1] <= b[None, :, 3])
        & (b[:, None, 3] >= b[None, :, 1])
    )
    ii, jj = np.nonzero(inter)
    want = set(zip(ii.tolist(), jj.tolist()))
    assert got == want
