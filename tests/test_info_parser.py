"""Info-parser tests against a realistic ffmpeg stderr transcript.

Same strategy as the reference's golden-transcript parser tests
(ff-video/src/parse.rs:325-416): feed a captured-style session line by line
and assert the typed infos message-by-message, plus malformed-line errors and
CR/LF splitter semantics.
"""

import pytest

from infur_tpu.errors import VideoParseError
from infur_tpu.video.info import (
    Codec, FrameUpdate, InfoParser, Section, Stream, split_lines,
)

# A realistic 720p transcode session transcript (synthesized for this suite).
SESSION = """\
Input #0, mov,mp4,m4a,3gp,3g2,mj2, from 'clip.mp4':
  Metadata:
    major_brand     : isom
  Duration: 00:00:05.00, start: 0.000000, bitrate: 1205 kb/s
  Stream #0:0(und): Video: h264 (High) (avc1 / 0x31637661), yuv420p, 1280x720 [SAR 1:1 DAR 16:9], 1203 kb/s, 30 fps, 30 tbr, 15360 tbn, 60 tbc (default)
  Stream #0:1(und): Audio: aac (LC) (mp4a / 0x6134706D), 44100 Hz, stereo, fltp, 128 kb/s
Stream mapping:
  Stream #0:0 -> #0:0 (h264 (native) -> rawvideo (native))
Output #0, image2pipe, to 'pipe:1':
  Metadata:
    encoder         : Lavf59.27.100
  Stream #0:0(und): Video: rawvideo (BGR[24] / 0x18524742), bgr24, 1280x720 [SAR 1:1 DAR 16:9], q=2-31, 663552 kb/s, 30 fps, 30 tbn (default)
[swscaler @ 0x55d2f00] deprecated pixel format used, make sure you did set range correctly
frame=   42 fps=0.0 q=-0.0 size=  113400kB time=00:00:01.40 bitrate=663552.0kbits/s dup=0 drop=0 speed=  28x
frame=  150 fps=978 q=-0.0 Lsize=  405000kB time=00:00:05.00 bitrate=663552.0kbits/s dup=0 drop=2 speed=32.6x
"""


def parse_all(text: str):
    p = InfoParser()
    return [info for info in p.iter_on(iter(text.splitlines())) if info is not None]


class TestTranscript:
    def test_session_messages(self):
        infos = parse_all(SESSION)
        assert infos == [
            Stream(Section.INPUT, 0, 1280, 720, 30.0),
            Stream(Section.OUTPUT, 0, 1280, 720, 30.0),
            Codec("swscaler", "deprecated pixel format used, make sure you did set range correctly"),
            FrameUpdate(frame=42, fps=0.0, dup=0, drop=0, speed=28.0),
            FrameUpdate(frame=150, fps=978.0, dup=0, drop=2, speed=32.6),
        ]

    def test_audio_only_input_yields_no_stream(self):
        text = (
            "Input #0, wav, from 'x.wav':\n"
            "  Stream #0:0: Audio: pcm_s16le, 44100 Hz, 2 channels, s16, 1411 kb/s\n"
        )
        assert parse_all(text) == []

    def test_stream_line_outside_section_ignored(self):
        p = InfoParser()
        line = "  Stream #0:0: Video: h264, yuv420p, 640x480, 25 fps"
        assert p.push(line) is None  # no Input/Output header seen yet

    def test_tbr_fallback_when_no_fps(self):
        text = (
            "Input #0, rtsp, from 'rtsp://cam':\n"
            "  Stream #0:0: Video: h264, yuvj420p, 1920x1080, 12.5 tbr, 90k tbn\n"
        )
        (s,) = parse_all(text)
        assert s == Stream(Section.INPUT, 0, 1920, 1080, 12.5)


class TestMalformed:
    def test_video_stream_without_dims(self):
        p = InfoParser()
        p.push("Input #0, mov, from 'x':")
        with pytest.raises(VideoParseError):
            p.push("  Stream #0:0: Video: h264, yuv420p, 30 fps")

    def test_video_stream_without_rate(self):
        p = InfoParser()
        p.push("Output #0, image2pipe, to 'pipe:1':")
        with pytest.raises(VideoParseError):
            p.push("  Stream #0:0: Video: rawvideo, bgr24, 640x480 ")

    def test_state_keeps_last_line(self):
        p = InfoParser()
        p.push("Input #0, mov, from 'x':")
        p.push("x: No such file or directory")
        assert p.state() == "x: No such file or directory"


class TestSplitLines:
    def test_cr_and_lf_terminators(self):
        chunks = [b"line one\nline", b" two\rline three\r\npartial"]
        assert list(split_lines(iter(chunks))) == [
            "line one", "line two", "line three", "partial",
        ]

    def test_empty_stream(self):
        assert list(split_lines(iter([]))) == []
