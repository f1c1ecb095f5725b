"""Video input layer: decoders, containers, synthetic sources.

Decode strategy (capability-equivalent to reference ff-video/, re-designed for
this environment):

* ``ffmpeg`` binary present  -> C++ ``ffpipe`` subprocess decoder (csrc/) with a
  pinned ring buffer, or the pure-Python pipe fallback — any URL/container
  ffmpeg can read, decoded to raw BGR24 over a pipe
  (reference ff-video/src/decoder.rs:32-37).
* ``.rvf`` files             -> native raw-video container reader (zero deps),
  also produced by the test generator; the C++ ring reader supports it too.
* ``synth:`` URLs            -> procedural test pattern source (ffmpeg
  ``lavfi testsrc`` stand-in, reference infur-test-gen/build.rs:12-31).
"""

from infur_tpu.video.rvf import RvfReader, RvfWriter, read_rvf, write_rvf  # noqa: F401
from infur_tpu.video.testsrc import testsrc_frame, synth_spec_from_url  # noqa: F401
from infur_tpu.video.decoder import VideoDecoder, open_video  # noqa: F401
