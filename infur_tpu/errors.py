"""Typed error taxonomy.

Errors in this framework are *values routed to the frontend*, never crashes:
each pipeline stage raises a stage-typed error, the scheduler loop catches it
and forwards it over the result channel, and the frontend renders it as a
per-stage status line.  This mirrors the reference's error design
(reference ff-video/src/error.rs:9-52, infur/src/app.rs:17-36,
infur/src/main.rs:69-72) re-expressed with Python exception subclassing
instead of Rust enums.

The hierarchy is intentionally shallow:

    InfurError
    ├── VideoError           (decode/process layer)
    │   ├── VideoStartError  (decoder startup handshake failed / timed out)
    │   ├── VideoEOF         (EOF-as-control-flow; normal end of stream)
    │   ├── VideoReadError   (truncated/failed frame read)
    │   └── VideoParseError  (decoder sideband info unparseable)
    ├── ScaleError           (invalid scale factor / zero-size frames)
    ├── ModelError           (model load / inference)
    │   ├── ModelLoadError
    │   └── ModelInputFormatError (heuristic importer can't infer pre-proc)
    └── ControlError         (invalid command for current state)
"""

from __future__ import annotations


class InfurError(Exception):
    """Base class for all framework errors."""

    #: Short stage tag used by frontends for per-stage status lines.
    stage: str = "app"


class VideoError(InfurError):
    stage = "video"


class VideoStartError(VideoError):
    """Decoder startup failed; carries the decoder's last diagnostic line.

    The reference blocks <=10s for the stream header and reports the last
    stderr line on failure (reference ff-video/src/decoder.rs:89-111).
    """

    def __init__(self, msg: str, last_line: str | None = None):
        super().__init__(msg if last_line is None else f"{msg}: {last_line!r}")
        self.last_line = last_line


class VideoEOF(VideoError):
    """Normal end of stream, used as control flow (not shown as an error).

    Mirrors ``VideoProcError::FinishedNormally``
    (reference ff-video/src/error.rs, infur/src/processing.rs:133-135).
    """


class VideoReadError(VideoError):
    """A frame read returned fewer bytes than one full frame."""


class VideoParseError(VideoError):
    """Decoder info sideband (e.g. ffmpeg stderr) could not be parsed."""


class ScaleError(InfurError):
    stage = "scale"


class ModelError(InfurError):
    stage = "model"


class ModelLoadError(ModelError):
    pass


class ModelInputFormatError(ModelError):
    """The model's input signature doesn't match any known image layout.

    Mirrors the reference's typed importer errors
    (reference infur/src/predict_onnx.rs:223-265).
    """


class ControlError(InfurError):
    """A command was invalid for the stage's current state."""
