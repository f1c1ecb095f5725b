#!/usr/bin/env python3
"""A stand-in `ffmpeg` for tests (no real ffmpeg exists in this image).

Speaks just enough of ffmpeg's contract to exercise the real decoder code
paths end-to-end: prints an Input/Output header on stderr (same shape as
the golden transcript in reference ff-video/src/parse.rs:325-358, including
CR-terminated progress lines), then streams raw bgr24 frames on stdout.

Interprets the LAST `-i` input as `shim:WxH@FPS:COUNT[:opts]`.  opts:
  `noheader` — never print the Output header (tests the timeout path);
  `hang` — with noheader: stay alive without a header (distinguishes the
  timeout path from the died-instantly fail-fast path);
  `slow` — sleep between frames (tests backpressure/close-while-streaming).
Writes 'q' on stdin (or closed stdout) to stop early, exiting 255 like
interrupted ffmpeg.
"""

import os
import re
import select
import sys
import time


def main() -> int:
    argv = sys.argv[1:]
    inputs = [argv[i + 1] for i, a in enumerate(argv[:-1]) if a == "-i"]
    pix_fmt = "bgr24"
    start_secs = 0.0
    for i, a in enumerate(argv[:-1]):
        if a == "-pix_fmt":
            pix_fmt = argv[i + 1]
        if a == "-ss":  # input-side fast seek, like real ffmpeg
            start_secs = float(argv[i + 1])
    spec = inputs[-1] if inputs else ""
    m = re.match(r"shim:(\d+)x(\d+)@([\d.]+):(\d+)((?::\w+)*)$", spec)
    if not m:
        sys.stderr.write(f"{spec}: Invalid argument\n")
        return 1
    w, h, fps, count = int(m[1]), int(m[2]), float(m[3]), int(m[4])
    opts = set((m[5] or "").strip(":").split(":")) - {""}

    nbytes = w * h * 3 // 2 if pix_fmt == "yuv420p" else w * h * 3
    err = sys.stderr
    # codec-bracketed line, like real ffmpeg (parse.rs:115-117)
    err.write("[lavfi @ 0x5591cbb2f680] dummy codec note\n")
    err.write(f"Input #0, lavfi, from '{spec}':\n")
    err.write("  Duration: N/A, start: 0.000000, bitrate: N/A\n")
    err.write(f"  Stream #0:0: Video: wrapped_avframe, rgb24, {w}x{h} "
              f"[SAR 1:1 DAR {w}:{h}], {fps} fps, {fps} tbr, {fps} tbn\n")
    err.flush()
    if "hang" in opts:  # alive but never produces a header
        time.sleep(30)
        return 1
    if "noheader" not in opts:
        err.write("Output #0, image2pipe, to 'pipe:1':\n")
        err.write("  Metadata:\n    encoder         : Lavf58.76.100\n")
        err.write(f"  Stream #0:0: Video: rawvideo, "
                  f"{pix_fmt}, {w}x{h} [SAR 1:1 DAR {w}:{h}], q=2-31, "
                  f"{int(nbytes*8*fps)} kb/s, {fps} fps, {fps} tbn\n")
        err.flush()

    out = sys.stdout.buffer
    frame = bytearray(nbytes)
    start = int(round(start_secs * fps))  # -ss skips whole frames
    for i in range(start, count):
        # deterministic content: every byte = (frame_index + offset) % 256
        for j in range(0, len(frame), 4096):
            chunk = bytes(((i + k) % 256) for k in range(j, min(j + 4096, len(frame))))
            frame[j:j + len(chunk)] = chunk
        try:
            out.write(bytes(frame))
            out.flush()
        except BrokenPipeError:
            return 255
        # progress line, CR-terminated like real ffmpeg (incl. dup/drop)
        err.write(f"frame={i+1:5d} fps={fps:.1f} q=-0.0 size={(i+1)*len(frame)//1024}kB "
                  f"time=00:00:0{i}.00 bitrate=N/A dup=1 drop=2 speed=33x    \r")
        err.flush()
        if "slow" in opts:
            time.sleep(0.05)
        # stop early on 'q'
        r, _, _ = select.select([sys.stdin], [], [], 0)
        if r and sys.stdin.read(1) == "q":
            return 255
    err.write("\nvideo:done\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
