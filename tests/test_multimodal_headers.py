"""Real image-container header parsing (pipelines/multimodal.py) — pure
numpy PNG IHDR / GIF LSD / JPEG SOF extraction, no image library.

The byte layouts asserted here are the published container formats:
PNG magic + mandatory-first IHDR (width/height BE u32 at offsets 16/20),
GIF87a/89a logical screen descriptor (LE u16 at 6/8), JPEG SOFn segment
found by marker scan at a variable offset.
"""

import numpy as np
import pyarrow as pa

from geo_index_ray.pipelines.multimodal import (
    _binary_views,
    parse_image_headers,
    synth_image_payloads,
)


def _parse(payloads):
    col = pa.array(payloads, pa.binary())
    return parse_image_headers(*_binary_views(pa.chunked_array([col])))


def _png(w, h):
    import struct

    return (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _jpeg(w, h, pad_segments=b""):
    import struct

    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHH", 11, 8, h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + pad_segments + sof0 + b"\xff\xd9"


class TestHeaderParse:
    def test_png_gif_jpeg_roundtrip(self):
        fmt, w, h = _parse([_png(640, 480), _gif(320, 200), _jpeg(1920, 1080)])
        assert list(fmt) == ["png", "gif", "jpeg"]
        assert list(w) == [640, 320, 1920]
        assert list(h) == [480, 200, 1080]

    def test_jpeg_sof_at_variable_offset(self):
        """A DQT segment (FF DB) before SOF moves the frame header — the
        vectorized marker scan must still find it; progressive JPEG uses
        SOF2 (FF C2) instead of SOF0."""
        dqt = b"\xff\xdb\x00\x43" + bytes(65)
        j1 = _jpeg(33, 44, pad_segments=dqt)
        j2 = j1.replace(b"\xff\xc0", b"\xff\xc2")  # SOF2 (progressive)
        fmt, w, h = _parse([j1, j2])
        assert list(fmt) == ["jpeg", "jpeg"]
        assert list(w) == [33, 33]
        assert list(h) == [44, 44]

    def test_dht_is_not_a_frame_marker(self):
        """FF C4 (Huffman table) is in the C0..CF range but NOT an SOF —
        it must be skipped in favor of the real SOF0 after it."""
        dht = b"\xff\xc4\x00\x1f\x00" + bytes(28)
        fmt, w, h = _parse([_jpeg(100, 50, pad_segments=dht)])
        assert list(fmt) == ["jpeg"]
        assert (list(w), list(h)) == ([100], [50])

    def test_unknown_and_truncated_payloads(self):
        fmt, w, h = _parse([b"", b"not an image", b"\x89PNG\r\n\x1a\n tru",
                            b"\xff\xd8\xff\xd9"])  # JPEG with no SOF
        assert list(fmt) == ["unknown", "unknown", "unknown", "jpeg"]
        assert list(w) == [0, 0, 0, 0]
        assert list(h) == [0, 0, 0, 0]

    def test_mixed_batch_rows_do_not_bleed(self):
        """JPEG scan hits are per-payload: a PNG between two JPEGs must not
        inherit a neighbor's SOF."""
        fmt, w, h = _parse([_jpeg(11, 22), _png(7, 9), _jpeg(33, 44)])
        assert list(fmt) == ["jpeg", "png", "jpeg"]
        assert list(w) == [11, 7, 33]
        assert list(h) == [22, 9, 44]


class TestSynthPayloads:
    def test_synth_parses_back_to_planted_dims(self):
        ids = np.arange(1, 2000, dtype=np.int64)
        arr = synth_image_payloads(ids)
        fmt, w, h = parse_image_headers(*_binary_views(pa.chunked_array([arr])))
        want_fmt = np.array(["png", "gif", "jpeg"])[(ids % 3).astype(int)]
        assert np.array_equal(fmt, want_fmt)
        assert np.array_equal(w, ids % 509 + 1)
        assert np.array_equal(h, ids % 251 + 1)

    def test_decode_stage_header_mode(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.multimodal import decode_metadata

        ids = np.arange(600, dtype=np.int64)
        tbl = pa.table({"doc_id": pa.array(ids),
                        "payload": synth_image_payloads(ids)})
        out = decode_metadata(
            ray.data.from_arrow(tbl), "doc_id", "payload", decode="header"
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(out.columns) == ["doc_id", "format", "n_bytes", "width",
                                     "height"]
        assert np.array_equal(out["width"].to_numpy(), ids % 509 + 1)
        assert np.array_equal(out["height"].to_numpy(), ids % 251 + 1)


class TestWavDecode:
    def test_synth_roundtrip_exact(self):
        import numpy as np
        import pyarrow as pa

        from geo_index_ray.pipelines.multimodal import (
            _WAV_MOD,
            _WAV_RATE,
            _WAV_SUB,
            _binary_views,
            parse_wav,
            synth_wav_payloads,
        )

        ids = np.arange(0, 400, 7, dtype=np.int64)
        col = pa.chunked_array([synth_wav_payloads(ids)])
        f = parse_wav(*_binary_views(col))
        assert f["ok"].all()
        ns = 160 + ids % 161
        assert (f["n_samples"] == ns).all()
        assert (f["sample_rate"] == _WAV_RATE).all()
        assert (f["duration_us"] == ns * 1_000_000 // _WAV_RATE).all()
        # brute-force per-id waveform aggregation
        for i, d in enumerate(ids):
            t = np.arange(ns[i], dtype=np.int64)
            x = (d * 31 + t * t * 7) % _WAV_MOD - _WAV_SUB
            assert f["sum_sq"][i] == int((x * x).sum())
            assert f["peak"][i] == int(np.abs(x).max())

    def test_corrupt_payloads_flagged_not_crashed(self):
        import numpy as np
        import pyarrow as pa

        from geo_index_ray.pipelines.multimodal import (
            _binary_views,
            parse_wav,
            synth_wav_payloads,
        )

        good = synth_wav_payloads(np.array([5], dtype=np.int64))[0].as_py()
        bad = [
            b"",                       # empty
            good[:30],                 # truncated header
            b"RIFX" + good[4:],        # wrong magic
            good[:40] + b"\xff\xff\xff\x7f",  # data size > payload
        ]
        col = pa.chunked_array([pa.array([good, *bad], pa.binary())])
        f = parse_wav(*_binary_views(col))
        assert f["ok"].tolist() == [True, False, False, False, False]
        assert (f["sum_sq"][1:] == 0).all()


class TestJpegSegmentWalk:
    """A raw FF Cx byte scan is wrong: APPn/COM payloads legally contain
    those bytes (EXIF thumbnails embed a whole JPEG).  The parser must
    walk segments by their length fields."""

    @staticmethod
    def _be16(v):
        return bytes([(v >> 8) & 0xFF, v & 0xFF])

    def test_exif_decoy_and_fill_bytes(self):
        import numpy as np
        import pyarrow as pa

        from geo_index_ray.pipelines.multimodal import (
            _binary_views,
            parse_image_headers,
        )

        be16 = self._be16
        app1_data = b"Exif\x00\x00\xff\xc0" + be16(9999) + be16(8888) + b"pad" * 5
        app1 = b"\xff\xe1" + be16(2 + len(app1_data)) + app1_data
        sof = b"\xff\xc0" + be16(11) + b"\x08" + be16(480) + be16(640) + b"\x01"
        jpg = b"\xff\xd8" + app1 + sof + b"\xff\xda" + be16(4) + b"xx\xff\xd9"
        # fill-byte padding + a standalone TEM marker before the SOF
        jpg2 = b"\xff\xd8\xff" + app1[1:] + b"\xff\x01" + sof + b"\xff\xd9"
        # SOS before any SOF: dimensions must stay 0 (not scanned from
        # entropy-coded data)
        jpg3 = (b"\xff\xd8\xff\xda" + be16(4) + b"xx"
                + b"\xff\xc0" + be16(11) + b"\x08" + be16(1) + be16(1) + b"\x01")
        col = pa.chunked_array([pa.array([jpg, jpg2, jpg3], pa.binary())])
        fmt, w, h = parse_image_headers(*_binary_views(col))
        assert fmt.tolist() == ["jpeg"] * 3
        assert (w[0], h[0]) == (640, 480)
        assert (w[1], h[1]) == (640, 480)
        assert (w[2], h[2]) == (0, 0)


class TestY4MDecode:
    """REAL YUV4MPEG2 parse: synth → parse_y4m roundtrip plus hostile
    container inputs (the video analog of TestWavDecode)."""

    def test_synth_roundtrip_exact(self):
        import numpy as np
        import pyarrow as pa

        from geo_index_ray.pipelines.multimodal import (
            _binary_views,
            _y4m_params,
            parse_y4m,
            synth_y4m_payloads,
        )

        ids = np.arange(1, 60, dtype=np.int64)
        col = pa.chunked_array([synth_y4m_payloads(ids)])
        f = parse_y4m(*_binary_views(col), every_n=2)
        assert f["ok"].all()
        w, h, nf = _y4m_params(ids)
        ns = (nf + 1) // 2
        assert len(f["row"]) == int(ns.sum())
        # exact pixel recompute for a sample of frames
        for t in range(0, len(f["row"]), 11):
            r = int(f["row"][t])
            fi = int(f["frame_idx"][t])
            k = np.arange(int(w[r] * h[r] * 3 // 2), dtype=np.int64)
            px = (ids[r] * 37 + fi * 13 + k * 11) % 251
            assert f["frame_sum"][t] == px.sum()
            assert f["frame_peak"][t] == px.max()
            assert (f["width"][t], f["height"][t]) == (w[r], h[r])

    def test_corrupt_payloads_flagged_not_crashed(self):
        import numpy as np
        import pyarrow as pa

        from geo_index_ray.pipelines.multimodal import (
            _binary_views,
            parse_y4m,
            synth_y4m_payloads,
        )

        good = synth_y4m_payloads(np.array([7], dtype=np.int64))[0].as_py()
        bad = pa.array(
            [
                b"",
                b"YUV4MPEG",                                  # short magic
                b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C444\n",      # non-420 chroma
                good[:-3],                                    # truncated frame
                good.replace(b"FRAME", b"FRAMX", 1),          # corrupt marker
                b"YUV4MPEG2 W9 H8 C420\n",                    # invalid 4:2:0 W
                b"YUV4MPEG2 WA H8 C420\n",                    # non-digit W
                good,                                         # control row
            ],
            pa.binary(),
        )
        f = parse_y4m(*_binary_views(pa.chunked_array([bad])))
        assert f["ok"].tolist() == [False] * 7 + [True]
        # no cross-payload bleed: every sampled frame belongs to row 7
        assert (f["row"] == 7).all()

    def test_header_variants_parse(self):
        import numpy as np
        import pyarrow as pa

        from geo_index_ray.pipelines.multimodal import _binary_views, parse_y4m

        fsize = 12 * 8 * 3 // 2
        frame = b"FRAME\n" + bytes(range(fsize))[:fsize]
        # parameter order per spec is free after the magic; C tag absent
        # defaults to 4:2:0
        v1 = b"YUV4MPEG2 H8 W12 F30000:1001 A1:1\n" + frame * 3
        v2 = b"YUV4MPEG2 W12 H8 C420mpeg2 Ip\n" + frame
        col = pa.chunked_array([pa.array([v1, v2], pa.binary())])
        f = parse_y4m(*_binary_views(col), every_n=2)
        assert f["ok"].tolist() == [True, True]
        assert f["width"].tolist()[:1] == [12]
        assert sorted(f["frame_idx"][f["row"] == 0].tolist()) == [0, 2]
        assert f["frame_idx"][f["row"] == 1].tolist() == [0]
