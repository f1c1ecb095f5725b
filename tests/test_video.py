"""Video layer tests: RVF container, synth source, decoder facade.

Models the reference's fixture-driven strategy (SURVEY.md sec. 4.1): real
files on disk, deterministic synthetic content, frame ids and EOF semantics
asserted exactly.
"""

import numpy as np
import pytest

from infur_tpu.errors import VideoEOF, VideoReadError, VideoStartError
from infur_tpu.video.rvf import RvfReader, RvfWriter, read_rvf, write_rvf
from infur_tpu.video.decoder import RvfDecoder, SynthDecoder, open_video
from infur_tpu.video.testsrc import SynthSpec, decode_frame_index, synth_spec_from_url
from infur_tpu.video.testsrc import testsrc_frame as synth_frame
from infur_tpu.video.testsrc import testsrc_video as synth_video


class TestRvf:
    def test_roundtrip(self, tmp_path, rng):
        frames = rng.integers(0, 256, (5, 32, 40, 3), dtype=np.uint8)
        p = tmp_path / "clip.rvf"
        write_rvf(p, frames, fps=25)
        hdr, back = read_rvf(p)
        assert (hdr.width, hdr.height, hdr.count) == (40, 32, 5)
        assert hdr.fps == 25
        np.testing.assert_array_equal(back, frames)

    def test_reader_frame_ids_and_eof(self, tmp_path, rng):
        frames = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
        p = tmp_path / "c.rvf"
        write_rvf(p, frames)
        with RvfReader(p) as r:
            buf = r.empty_image()
            assert [r.read_frame_into(buf) for _ in range(3)] == [1, 2, 3]
            with pytest.raises(VideoEOF):
                r.read_frame_into(buf)

    def test_truncated_frame(self, tmp_path, rng):
        frames = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
        p = tmp_path / "t.rvf"
        write_rvf(p, frames)
        data = p.read_bytes()
        p.write_bytes(data[:-10])  # chop the last frame
        with RvfReader(p) as r:
            buf = r.empty_image()
            assert r.read_frame_into(buf) == 1
            with pytest.raises(VideoReadError):
                r.read_frame_into(buf)

    def test_bad_header(self, tmp_path):
        p = tmp_path / "bad.rvf"
        p.write_bytes(b"NOPE" + b"\x00" * 28)
        with pytest.raises(VideoStartError):
            RvfReader(p)

    def test_wrong_buffer_size(self, tmp_path, rng):
        p = tmp_path / "c.rvf"
        write_rvf(p, rng.integers(0, 256, (1, 8, 8, 3), dtype=np.uint8))
        with RvfReader(p) as r:
            with pytest.raises(VideoReadError):
                r.read_frame_into(np.empty((4, 4, 3), np.uint8))

    def test_writer_rejects_wrong_shape(self, tmp_path):
        w = RvfWriter(tmp_path / "w.rvf", 8, 8)
        with pytest.raises(ValueError):
            w.write_frame(np.zeros((8, 9, 3), np.uint8))
        w.close()


class TestSynth:
    def test_url_parse(self):
        s = synth_spec_from_url("synth:1280x720@30:5")
        assert s == SynthSpec(1280, 720, 30.0, 150)
        s = synth_spec_from_url("synth:640x480@10:400f")
        assert s == SynthSpec(640, 480, 10.0, 400)
        assert synth_spec_from_url("movie.mp4") is None

    def test_deterministic_and_index_coded(self):
        spec = SynthSpec(128, 96, 30.0, 40)
        a = synth_frame(spec, 7)
        b = synth_frame(spec, 7)
        np.testing.assert_array_equal(a, b)
        for i in (0, 1, 13, 39):
            assert decode_frame_index(synth_frame(spec, i), spec) == i

    def test_video_batch(self):
        spec = SynthSpec(64, 48, 10.0, 4)
        vid = synth_video(spec)
        assert vid.shape == (4, 48, 64, 3)
        assert not np.array_equal(vid[0], vid[1])  # motion exists


class TestDecoderFacade:
    def test_synth_decoder(self):
        d = open_video(["synth:64x48@10:3f"])
        assert isinstance(d, SynthDecoder)
        assert (d.width, d.height, d.fps) == (64, 48, 10.0)
        buf = d.empty_image()
        assert [d.read_frame_into(buf) for _ in range(3)] == [1, 2, 3]
        with pytest.raises(VideoEOF):
            d.read_frame_into(buf)
        d.close()

    def test_rvf_decoder(self, small_clip):
        path, spec, frames = small_clip
        d = open_video([path])
        assert isinstance(d, RvfDecoder)
        assert (d.width, d.height) == (spec.width, spec.height)
        buf = d.empty_image()
        assert d.read_frame_into(buf) == 1
        np.testing.assert_array_equal(buf, frames[0])
        d.close()

    def test_unknown_source_without_ffmpeg(self, monkeypatch):
        monkeypatch.setattr("infur_tpu.video.decoder.have_ffmpeg", lambda: False)
        with pytest.raises(VideoStartError):
            open_video(["http://example.com/stream.mp4"])

    def test_empty_inputs(self):
        with pytest.raises(VideoStartError):
            open_video([])


class TestImageDecoder:
    """Still-image sources: the reference's "images" capability
    (reference Cargo.toml:9, one image2pipe frame then EOF)."""

    @staticmethod
    def _png(path, bgr):
        from PIL import Image
        Image.fromarray(np.ascontiguousarray(bgr[:, :, ::-1]), "RGB").save(path)

    def test_png_single_frame_then_eof(self, tmp_path, rng):
        from infur_tpu.video.image import ImageDecoder
        bgr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        p = tmp_path / "img.png"
        self._png(p, bgr)
        d = open_video([str(p)])
        assert isinstance(d, ImageDecoder)
        assert (d.width, d.height, d.fps) == (32, 24, 25.0)
        buf = d.empty_image()
        assert d.read_frame_into(buf) == 1
        np.testing.assert_array_equal(buf, bgr)  # PNG is lossless
        with pytest.raises(VideoEOF):
            d.read_frame_into(buf)
        d.close()

    def test_multi_image_sequence(self, tmp_path, rng):
        imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                for _ in range(3)]
        paths = []
        for i, im in enumerate(imgs):
            p = tmp_path / f"f{i}.png"
            self._png(p, im)
            paths.append(str(p))
        d = open_video(paths)
        buf = d.empty_image()
        for i, im in enumerate(imgs):
            assert d.read_frame_into(buf) == i + 1
            np.testing.assert_array_equal(buf, im)
        with pytest.raises(VideoEOF):
            d.read_frame_into(buf)

    def test_npy_image(self, tmp_path, rng):
        bgr = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
        p = tmp_path / "img.npy"
        np.save(p, bgr)
        d = open_video([str(p)])
        buf = d.empty_image()
        d.read_frame_into(buf)
        np.testing.assert_array_equal(buf, bgr)

    def test_mismatched_dims_is_typed_error(self, tmp_path, rng):
        a, b = tmp_path / "a.png", tmp_path / "b.png"
        self._png(a, rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
        self._png(b, rng.integers(0, 256, (8, 16, 3), dtype=np.uint8))
        with pytest.raises(VideoStartError):
            open_video([str(a), str(b)])

    def test_undecodable_is_typed_error(self, tmp_path):
        p = tmp_path / "junk.png"
        p.write_bytes(b"not a png at all")
        with pytest.raises(VideoStartError):
            open_video([str(p)])

    def test_yuv420p_wire_format(self, tmp_path, rng):
        from infur_tpu.ops.yuv import bgr_to_i420
        bgr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        p = tmp_path / "img.png"
        self._png(p, bgr)
        d = open_video([str(p)], pix_fmt="yuv420p")
        buf = d.empty_image()
        assert buf.shape == (24 * 32 * 3 // 2,)
        d.read_frame_into(buf)
        np.testing.assert_array_equal(buf, bgr_to_i420(bgr))
        # odd dims refuse 4:2:0, same rule as the synth source
        q = tmp_path / "odd.png"
        self._png(q, rng.integers(0, 256, (9, 9, 3), dtype=np.uint8))
        with pytest.raises(VideoStartError):
            open_video([str(q)], pix_fmt="yuv420p")
