"""Example: segment a LIVE source (webcam-bridge pattern).

A producer thread pushes BGR frames into a :class:`PushSource` (latest
wins — a live camera never blocks on its consumer); the pipeline plays it
through the ordinary ``live:`` URL, so every frontend works unchanged.
With a real camera + ffmpeg, ``Play(["camera:/dev/video0"])`` does the
same through the pipe decoder.
"""

import threading
import time

import numpy as np

from infur_tpu.app import ModelCmd, ProcessingApp, ScaleCmd
from infur_tpu.processing import Play
from infur_tpu.video.live import PushSource, register_live_source

src = PushSource(320, 240, fps=30.0)
url = register_live_source("demo-cam", src)


def producer():
    """Stand-in for a camera callback: push a moving gradient."""
    for i in range(30):
        frame = np.zeros((240, 320, 3), np.uint8)
        frame[:, :, 0] = (np.arange(320)[None, :] + 4 * i) % 256  # B sweep
        frame[:, :, 2] = 128
        src.push(frame)
        time.sleep(1 / 30)
    src.close()


threading.Thread(target=producer, daemon=True).start()

app = ProcessingApp()
app.control(ScaleCmd(0.5))
app.control(Play([url]))
app.control(ModelCmd("lraspp"))  # the realtime family

shown = 0
while (frame := app.generate()) is not None:
    shown += 1
print(f"processed {shown} live frames; dropped {src.dropped} "
      "(consumer slower than producer — live semantics)")
