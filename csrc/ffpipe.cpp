// ffpipe: native ffmpeg rawvideo-pipe decoder with a read-ahead frame ring.
//
// The native equivalent of the reference's ff-video crate
// (reference ff-video/src/decoder.rs, parse.rs), built as a C library for
// ctypes binding:
//
//   * spawns `ffmpeg -hide_banner -i <inputs...> -an -f image2pipe
//     -fflags nobuffer -pix_fmt bgr24 -c:v rawvideo pipe:1` with all three
//     stdio piped (decoder.rs:32-37,53-67);
//   * a stderr thread parses the human-readable sideband for the Output
//     stream header (width/height/fps) and keeps the last line for
//     diagnostics (parse.rs; lines split on both \n and \r because ffmpeg
//     progress lines end with bare CR, parse.rs:280-319);
//   * open blocks up to 10 s for the header (decoder.rs:89-111);
//   * a reader thread pre-decodes into a ring of whole frames so the
//     consumer overlaps decode with compute (the Python pipe reader can't);
//     ring depth bounds memory and provides backpressure: when the ring is
//     full the reader stalls, the OS pipe fills, ffmpeg stalls;
//   * close writes 'q' to ffmpeg stdin, drains, reaps, reports the exit
//     code (decoder.rs:119-148).
//
// Error codes (negative returns): see FFP_E* below.

#include <atomic>
#include <cctype>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <poll.h>
#include <signal.h>
#include <spawn.h>
#include <sys/wait.h>
#include <unistd.h>

extern "C" {

enum {
  FFP_OK = 0,
  FFP_EOF = -1,         // clean end of stream
  FFP_ESPAWN = -2,      // could not spawn ffmpeg
  FFP_EHEADER = -3,     // no Output stream header within timeout
  FFP_EREAD = -4,       // truncated frame / read error
  FFP_EEXIT = -5,       // ffmpeg exited nonzero
  FFP_EARG = -6,        // bad argument
  FFP_ECLOSED = -7,     // handle already closed
};

struct ffp_handle;

}  // extern "C"

namespace {

constexpr int kDefaultHeaderTimeoutMs = 10000;  // decoder.rs:89-111

struct Ring {
  std::vector<std::vector<uint8_t>> slots;
  std::vector<int64_t> ids;
  size_t head = 0, tail = 0, count = 0;
  std::mutex mu;
  std::condition_variable cv_can_put, cv_can_get;
  bool producer_done = false;
  int producer_error = FFP_OK;
};

// Full sideband parser, the native twin of the reference's InfoParser
// (reference ff-video/src/parse.rs):
//   * Input#/Output# headers set the section context (parse.rs:82-112);
//   * "Stream #N:M: Video:" lines yield geometry/fps for that section
//     (parse.rs:129-197) — the first OUTPUT video stream is the decode
//     contract, the first INPUT one is surfaced as telemetry;
//   * "[codec]"-bracketed lines become codec infos (parse.rs:115-117);
//   * "frame= N fps= ... dup= drop= speed=" progress lines become
//     FrameUpdates (parse.rs:200-230) — free decode-throughput telemetry.
struct VideoStreamInfo {
  int width = 0, height = 0;
  double fps = 0.0;
  bool present = false;
};

struct FrameUpdateInfo {
  int64_t frame = -1;  // -1: none seen yet
  double fps = -1.0;
  int64_t dup = -1, drop = -1;
  double speed = -1.0;
};

struct InfoParse {
  enum Section { NONE, INPUT, OUTPUT } section = NONE;
  VideoStreamInfo output, input;
  FrameUpdateInfo update;
  std::string codecs;            // "[h264] msg" lines, newline-joined
  std::string last_line;
  std::mutex mu;

  static constexpr size_t kCodecCap = 8192;

  // parse "<digits>x<digits>" + "<num> fps|tbr" out of a stream line
  static void parse_stream_line(const char* s, VideoStreamInfo* v) {
    for (const char* p = s; *p; ++p) {
      if (isdigit(*p) && (p == s || !isdigit(p[-1]))) {
        char* end = nullptr;
        long w = strtol(p, &end, 10);
        if (end && *end == 'x' && isdigit(end[1])) {
          char* end2 = nullptr;
          long h = strtol(end + 1, &end2, 10);
          if (w > 0 && h > 0 && w < 65536 && h < 65536) {
            v->width = (int)w;
            v->height = (int)h;
            p = end2 - 1;
          }
        }
      }
    }
    for (const char* key : {" fps", " tbr"}) {
      const char* k = strstr(s, key);
      while (k) {
        const char* q = k;
        while (q > s && (isdigit(q[-1]) || q[-1] == '.')) --q;
        if (q < k) { v->fps = atof(std::string(q, k - q).c_str()); break; }
        k = strstr(k + 1, key);
      }
      if (v->fps > 0) break;
    }
    if (v->width > 0) v->present = true;
  }

  // parse "key=  <num>" (ffmpeg pads values with spaces)
  static bool num_after(const char* s, const char* key, double* out) {
    const char* k = strstr(s, key);
    if (!k) return false;
    const char* p = k + strlen(key);
    while (*p == ' ') ++p;
    char* end = nullptr;
    double v = strtod(p, &end);
    if (end == p) return false;
    *out = v;
    return true;
  }

  void feed_line(const std::string& line) {
    std::lock_guard<std::mutex> lk(mu);
    if (!line.empty()) last_line = line;
    const char* s = line.c_str();
    if (line.rfind("Input #", 0) == 0) { section = INPUT; return; }
    if (line.rfind("Output #", 0) == 0) { section = OUTPUT; return; }
    if (line.rfind("frame=", 0) == 0) {  // progress line (parse.rs:200-230)
      double v;
      if (num_after(s, "frame=", &v)) update.frame = (int64_t)v;
      if (num_after(s, "fps=", &v)) update.fps = v;
      if (num_after(s, "dup=", &v)) update.dup = (int64_t)v;
      if (num_after(s, "drop=", &v)) update.drop = (int64_t)v;
      if (num_after(s, "speed=", &v)) update.speed = v;
      return;
    }
    if (!line.empty() && line[0] == '[' &&
        line.find(']') != std::string::npos) {  // codec info (parse.rs:115)
      if (codecs.size() + line.size() + 1 <= kCodecCap) {
        if (!codecs.empty()) codecs.push_back('\n');
        codecs += line;
      }
      return;
    }
    if (section == NONE || !strstr(s, "Stream #") || !strstr(s, "Video:"))
      return;
    VideoStreamInfo* v = section == OUTPUT ? &output : &input;
    if (!v->present) parse_stream_line(s, v);
  }
};

}  // namespace

extern "C" struct ffp_handle {
  pid_t pid = -1;
  int stdin_fd = -1, stdout_fd = -1, stderr_fd = -1;
  int width = 0, height = 0;
  double fps = 0.0;
  size_t frame_bytes = 0;
  std::atomic<int64_t> frames_read{0};
  InfoParse info;
  Ring ring;
  std::thread stderr_thread, reader_thread;
  std::atomic<bool> closing{false};
  std::mutex header_mu;
  std::condition_variable header_cv;
  bool header_ready = false;
  bool stderr_closed = false;  // ffmpeg died before a header: fail fast
  int exit_code = -9999;
};

namespace {

void stderr_loop(ffp_handle* h) {
  std::string cur;
  char buf[4096];
  while (true) {
    ssize_t n = read(h->stderr_fd, buf, sizeof buf);
    if (n <= 0) break;
    for (ssize_t i = 0; i < n; ++i) {
      char c = buf[i];
      if (c == '\n' || c == '\r') {  // ffmpeg progress uses bare CR
        if (!cur.empty()) h->info.feed_line(cur);
        cur.clear();
      } else {
        cur.push_back(c);
      }
    }
    bool have_output;
    {
      std::lock_guard<std::mutex> ilk(h->info.mu);
      have_output = h->info.output.present;
    }
    if (have_output) {
      std::lock_guard<std::mutex> lk(h->header_mu);
      if (!h->header_ready) {
        h->header_ready = true;
        h->header_cv.notify_all();
      }
    }
  }
  if (!cur.empty()) h->info.feed_line(cur);
  // EOF on stderr (ffmpeg died, e.g. nonexistent input): set the flag the
  // open() predicate checks so it fails fast instead of sitting out the
  // whole header timeout
  std::lock_guard<std::mutex> lk(h->header_mu);
  h->stderr_closed = true;
  h->header_cv.notify_all();
}

void reader_loop(ffp_handle* h) {
  int64_t next_id = 1;
  while (!h->closing.load()) {
    // claim a slot
    std::unique_lock<std::mutex> lk(h->ring.mu);
    h->ring.cv_can_put.wait(lk, [&] {
      return h->ring.count < h->ring.slots.size() || h->closing.load();
    });
    if (h->closing.load()) {
      h->ring.producer_done = true;
      h->ring.cv_can_get.notify_all();
      return;
    }
    size_t slot = h->ring.tail;
    lk.unlock();

    uint8_t* dst = h->ring.slots[slot].data();
    size_t want = h->frame_bytes;
    size_t got = 0;
    bool ok = true, eof = false;
    while (got < want) {
      ssize_t k = read(h->stdout_fd, dst + got, want - got);
      if (k <= 0) { ok = false; eof = (got == 0); break; }
      got += k;
    }

    lk.lock();
    if (!ok) {
      h->ring.producer_done = true;
      h->ring.producer_error = eof ? FFP_EOF : FFP_EREAD;
      h->ring.cv_can_get.notify_all();
      return;
    }
    if (h->closing.load()) {  // woken by close: release any blocked reader
      h->ring.producer_done = true;
      h->ring.producer_error = FFP_EOF;
      h->ring.cv_can_get.notify_all();
      return;
    }
    h->ring.ids[slot] = next_id++;
    h->ring.tail = (slot + 1) % h->ring.slots.size();
    h->ring.count++;
    h->ring.cv_can_get.notify_all();
  }
}

}  // namespace

extern "C" {

// Open: argv-style inputs; ring_depth frames of read-ahead (>=1);
// pix_fmt "bgr24" (3 B/px) or "yuv420p" (1.5 B/px, decode-native planar);
// header_timeout_ms <= 0 selects the default 10 s (decoder.rs:89-111);
// start_secs > 0 emits an input-side "-ss" (fast seek) before each -i —
// the player's Seek support for pipe sources (reopen-at-offset).
int ffp_open(const char** inputs, int n_inputs, int ring_depth,
             const char* pix_fmt, int header_timeout_ms, double start_secs,
             ffp_handle** out) {
  if (!inputs || n_inputs <= 0 || !out || ring_depth < 1) return FFP_EARG;
  if (header_timeout_ms <= 0) header_timeout_ms = kDefaultHeaderTimeoutMs;
  if (!pix_fmt) pix_fmt = "bgr24";
  const bool yuv = strcmp(pix_fmt, "yuv420p") == 0;
  if (!yuv && strcmp(pix_fmt, "bgr24") != 0) return FFP_EARG;

  std::vector<std::string> args = {"ffmpeg", "-hide_banner"};
  char ss[32] = {0};
  if (start_secs > 0) snprintf(ss, sizeof ss, "%.3f", start_secs);
  for (int i = 0; i < n_inputs; ++i) {
    if (ss[0]) {
      args.push_back("-ss");
      args.push_back(ss);
    }
    args.push_back("-i");
    args.push_back(inputs[i]);
  }
  for (const char* a : {"-an", "-f", "image2pipe", "-fflags", "nobuffer",
                        "-pix_fmt", pix_fmt, "-c:v", "rawvideo", "pipe:1"})
    args.push_back(a);

  int in_pipe[2], out_pipe[2], err_pipe[2];
  if (pipe(in_pipe) || pipe(out_pipe) || pipe(err_pipe)) return FFP_ESPAWN;

  posix_spawn_file_actions_t fa;
  posix_spawn_file_actions_init(&fa);
  posix_spawn_file_actions_adddup2(&fa, in_pipe[0], 0);
  posix_spawn_file_actions_adddup2(&fa, out_pipe[1], 1);
  posix_spawn_file_actions_adddup2(&fa, err_pipe[1], 2);
  for (int fd : {in_pipe[0], in_pipe[1], out_pipe[0], out_pipe[1],
                 err_pipe[0], err_pipe[1]})
    posix_spawn_file_actions_addclose(&fa, fd);

  std::vector<char*> argv;
  for (auto& a : args) argv.push_back(const_cast<char*>(a.c_str()));
  argv.push_back(nullptr);

  pid_t pid = -1;
  extern char** environ;
  int rc = posix_spawnp(&pid, "ffmpeg", &fa, nullptr, argv.data(), environ);
  posix_spawn_file_actions_destroy(&fa);
  close(in_pipe[0]); close(out_pipe[1]); close(err_pipe[1]);
  if (rc != 0) {
    close(in_pipe[1]); close(out_pipe[0]); close(err_pipe[0]);
    return FFP_ESPAWN;
  }

  auto* h = new ffp_handle();
  h->pid = pid;
  h->stdin_fd = in_pipe[1];
  h->stdout_fd = out_pipe[0];
  h->stderr_fd = err_pipe[0];
  h->stderr_thread = std::thread(stderr_loop, h);

  // block for the Output stream header; a dead subprocess (stderr EOF
  // without a header) releases the wait immediately
  {
    std::unique_lock<std::mutex> lk(h->header_mu);
    h->header_cv.wait_for(lk, std::chrono::milliseconds(header_timeout_ms),
                          [&] { return h->header_ready || h->stderr_closed; });
    if (!h->header_ready) {
      lk.unlock();
      kill(pid, SIGKILL);
      h->closing = true;
      close(h->stdin_fd); close(h->stdout_fd);
      h->stderr_thread.join();
      close(h->stderr_fd);
      int st; waitpid(pid, &st, 0);
      delete h;
      return FFP_EHEADER;
    }
  }
  {
    std::lock_guard<std::mutex> ilk(h->info.mu);
    h->width = h->info.output.width;
    h->height = h->info.output.height;
    h->fps = h->info.output.fps;
  }
  h->frame_bytes = yuv ? (size_t)h->width * h->height * 3 / 2
                       : (size_t)h->width * h->height * 3;

  h->ring.slots.resize(ring_depth);
  h->ring.ids.resize(ring_depth);
  for (auto& s : h->ring.slots) s.resize(h->frame_bytes);
  h->reader_thread = std::thread(reader_loop, h);

  *out = h;
  return FFP_OK;
}

int ffp_geometry(ffp_handle* h, int* w, int* hh, double* fps) {
  if (!h) return FFP_EARG;
  *w = h->width; *hh = h->height; *fps = h->fps;
  return FFP_OK;
}

// Copy the next decoded frame into buf (frame_bytes long).
// Returns the 1-based frame id, or FFP_EOF / FFP_EREAD.
int64_t ffp_read_frame(ffp_handle* h, uint8_t* buf, size_t len) {
  if (!h || !buf) return FFP_EARG;
  if (len != h->frame_bytes) return FFP_EARG;
  std::unique_lock<std::mutex> lk(h->ring.mu);
  h->ring.cv_can_get.wait(lk, [&] {
    return h->ring.count > 0 || h->ring.producer_done;
  });
  if (h->ring.count == 0) return h->ring.producer_error;
  size_t slot = h->ring.head;
  int64_t id = h->ring.ids[slot];
  lk.unlock();
  memcpy(buf, h->ring.slots[slot].data(), h->frame_bytes);
  lk.lock();
  h->ring.head = (slot + 1) % h->ring.slots.size();
  h->ring.count--;
  h->ring.cv_can_put.notify_all();
  h->frames_read = id;
  return id;
}

// Last stderr line (diagnostics for start/exit errors).
int ffp_last_line(ffp_handle* h, char* buf, size_t n) {
  if (!h || !buf || n == 0) return FFP_EARG;
  std::lock_guard<std::mutex> lk(h->info.mu);
  snprintf(buf, n, "%s", h->info.last_line.c_str());
  return FFP_OK;
}

// First INPUT-section video stream (telemetry; zeros if none parsed yet).
int ffp_input_geometry(ffp_handle* h, int* w, int* hh, double* fps) {
  if (!h || !w || !hh || !fps) return FFP_EARG;
  std::lock_guard<std::mutex> lk(h->info.mu);
  *w = h->info.input.width;
  *hh = h->info.input.height;
  *fps = h->info.input.fps;
  return FFP_OK;
}

// Latest "frame= fps= dup= drop= speed=" progress update (parse.rs:200-230).
// Returns the frame counter (>=0) or -1 if no update has been seen;
// missing optional fields stay at -1 / -1.0.
int64_t ffp_frame_update(ffp_handle* h, double* fps, int64_t* dup,
                         int64_t* drop, double* speed) {
  if (!h) return FFP_EARG;
  std::lock_guard<std::mutex> lk(h->info.mu);
  if (fps) *fps = h->info.update.fps;
  if (dup) *dup = h->info.update.dup;
  if (drop) *drop = h->info.update.drop;
  if (speed) *speed = h->info.update.speed;
  return h->info.update.frame;
}

// Newline-joined "[codec] ..." stderr lines seen so far (parse.rs:115-117).
int ffp_codec_lines(ffp_handle* h, char* buf, size_t n) {
  if (!h || !buf || n == 0) return FFP_EARG;
  std::lock_guard<std::mutex> lk(h->info.mu);
  snprintf(buf, n, "%s", h->info.codecs.c_str());
  return FFP_OK;
}

// Graceful close: 'q' to stdin, drain stdout, reap; returns ffmpeg's exit
// code (>=0) or an FFP_E* error.
int ffp_close(ffp_handle* h) {
  if (!h) return FFP_EARG;
  if (h->closing.exchange(true)) return FFP_ECLOSED;
  {
    // release BOTH sides: the producer blocked on a full ring and any
    // consumer blocked in ffp_read_frame on an empty one (the consumer's
    // wait predicate sees producer_done and returns FFP_EOF)
    std::lock_guard<std::mutex> lk(h->ring.mu);
    h->ring.producer_done = true;
    if (h->ring.producer_error == FFP_OK) h->ring.producer_error = FFP_EOF;
    h->ring.cv_can_put.notify_all();
    h->ring.cv_can_get.notify_all();
  }

  ssize_t ignored = write(h->stdin_fd, "q", 1);
  (void)ignored;
  close(h->stdin_fd);
  // drain stdout so ffmpeg can flush and exit (decoder.rs:119-148)
  char sink[1 << 16];
  while (read(h->stdout_fd, sink, sizeof sink) > 0) {}
  close(h->stdout_fd);

  if (h->reader_thread.joinable()) h->reader_thread.join();
  if (h->stderr_thread.joinable()) h->stderr_thread.join();
  close(h->stderr_fd);

  int st = 0;
  waitpid(h->pid, &st, 0);
  int code = WIFEXITED(st) ? WEXITSTATUS(st)
             : (WIFSIGNALED(st) ? 128 + WTERMSIG(st) : -1);
  h->exit_code = code;
  delete h;
  return code;
}

}  // extern "C"
