"""Procedural test-pattern video source (``synth:`` URLs).

Stand-in for ffmpeg's ``lavfi testsrc`` which the reference uses to generate
deterministic fixture videos (reference infur-test-gen/build.rs:12-31,78-85).
No ffmpeg exists in this environment, so the pattern is generated directly:
SMPTE-ish color bars, a horizontal gradient strip, a moving block whose
position encodes time, and a binary frame-index strip (so tests can recover
the frame number from pixels alone).

URL grammar::

    synth:WxH@FPS:D        e.g. synth:1280x720@30:5   (5 seconds)
    synth:WxH@FPS:Nf       e.g. synth:640x480@10:400f (400 frames)

Frames are uint8 BGR (the framework's host-side frame currency, matching the
reference's BgrImage — reference image-ext/src/image_bgr.rs:11).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

# Eight full-saturation bars (RGB), white->black ordering like SMPTE top bars.
_BARS_RGB = np.array(
    [
        (255, 255, 255), (255, 255, 0), (0, 255, 255), (0, 255, 0),
        (255, 0, 255), (255, 0, 0), (0, 0, 255), (0, 0, 0),
    ],
    np.uint8,
)


@dataclass(frozen=True)
class SynthSpec:
    width: int
    height: int
    fps: float
    count: int  # total frames

    def url(self) -> str:
        return f"synth:{self.width}x{self.height}@{self.fps:g}:{self.count}f"


_URL_RE = re.compile(
    r"^synth:(?P<w>\d+)x(?P<h>\d+)@(?P<fps>\d+(?:\.\d+)?)"
    r":(?P<dur>\d+(?:\.\d+)?)(?P<unit>f?)$"
)


def synth_spec_from_url(url: str) -> SynthSpec | None:
    """Parse a ``synth:`` URL; return None if it isn't one."""
    m = _URL_RE.match(url)
    if not m:
        return None
    w, h, fps = int(m["w"]), int(m["h"]), float(m["fps"])
    count = int(float(m["dur"])) if m["unit"] == "f" else int(round(float(m["dur"]) * fps))
    return SynthSpec(w, h, fps, max(count, 1))


def testsrc_frame(spec: SynthSpec, index: int, out: np.ndarray | None = None) -> np.ndarray:
    """Render frame ``index`` (0-based) of the test pattern into BGR uint8."""
    h, w = spec.height, spec.width
    if out is None:
        out = np.empty((h, w, 3), np.uint8)

    # Top 60%: color bars.
    bars_h = (h * 3) // 5
    bar_w = max(w // len(_BARS_RGB), 1)
    cols = np.minimum(np.arange(w) // bar_w, len(_BARS_RGB) - 1)
    out[:bars_h] = _BARS_RGB[cols][None, :, ::-1]  # RGB -> BGR

    # Next 20%: horizontal gradient (gray ramp).
    grad_h0, grad_h1 = bars_h, bars_h + h // 5
    ramp = (np.arange(w) * 255 // max(w - 1, 1)).astype(np.uint8)
    out[grad_h0:grad_h1] = ramp[None, :, None]

    # Bottom 20%: black background + moving red block + frame-index bit strip.
    out[grad_h1:] = 0
    blk = max(h // 10, 4)
    x0 = (index * max(w // 64, 1)) % max(w - blk, 1)
    y0 = grad_h1
    out[y0:y0 + blk, x0:x0 + blk] = (0, 0, 255)  # red in BGR

    # 24-bit frame index encoded as bit cells along the bottom row block.
    cell = max(w // 32, 2)
    y1 = min(y0 + blk + 2, h - 1)
    strip = out[y1:min(y1 + max(blk // 2, 2), h)]
    for bit in range(24):
        val = 255 if (index >> bit) & 1 else 32
        xa = bit * cell
        if xa >= w:
            break
        strip[:, xa:min(xa + cell, w)] = (val, val, val)
    return out


def decode_frame_index(img: np.ndarray, spec: SynthSpec) -> int:
    """Recover the encoded frame index from a rendered pattern frame."""
    h, w = spec.height, spec.width
    bars_h = (h * 3) // 5
    grad_h1 = bars_h + h // 5
    blk = max(h // 10, 4)
    y1 = min(grad_h1 + blk + 2, h - 1)
    cell = max(w // 32, 2)
    row = img[min(y1 + 1, img.shape[0] - 1)]
    index = 0
    for bit in range(24):
        xa = bit * cell
        if xa + cell // 2 >= w:
            break
        if row[xa + cell // 2, 0] > 128:
            index |= 1 << bit
    return index


def testsrc_video(spec: SynthSpec) -> np.ndarray:
    """Render the full clip as (N,H,W,3) uint8 BGR."""
    out = np.empty((spec.count, spec.height, spec.width, 3), np.uint8)
    for i in range(spec.count):
        testsrc_frame(spec, i, out[i])
    return out
