// Native frame-source runtime: threaded producers + SPSC ring buffer.
//
// The reference's data path is cv2.VideoCapture decoding frames one at a
// time on the consumer thread (data/loaders/video_loader.py:86-131), which
// serializes decode with compute.  This runtime decouples them: a producer
// thread fills a fixed-slot ring (synthetic generation or raw-file reads
// with readahead) while the Python/JAX consumer drains batches, so host
// decode overlaps device execution.
//
// C ABI only — consumed via ctypes (no pybind11 in this environment).
//
// Build: make -C <this dir>   ->  libmadpp_runtime.so

#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct FrameRing {
  int width = 0;
  int height = 0;
  int channels = 3;
  int slots = 0;
  size_t frame_bytes = 0;

  std::vector<uint8_t> storage;      // slots * frame_bytes
  std::vector<int64_t> slot_index;   // frame index stored in each slot

  std::mutex mu;
  std::condition_variable not_empty;
  std::condition_variable not_full;
  int64_t head = 0;  // next slot to consume
  int64_t tail = 0;  // next slot to produce
  bool done = false;

  std::atomic<int64_t> produced{0};
  std::atomic<int64_t> consumed{0};

  std::thread producer;

  uint8_t* slot_ptr(int64_t s) { return storage.data() + (s % slots) * frame_bytes; }
};

// --- synthetic road-frame rasterizer -------------------------------------
// Mirrors data/frames.py's SyntheticRoadGenerator geometry: sky gradient,
// grass, road trapezoid to a vanishing point, solid lane edges.

void draw_line(uint8_t* img, int w, int h, int x0, int y0, int x1, int y1,
               int thickness, uint8_t b, uint8_t g, uint8_t r) {
  int dx = std::abs(x1 - x0), dy = std::abs(y1 - y0);
  int steps = std::max(dx, dy);
  if (steps == 0) steps = 1;
  for (int i = 0; i <= steps; ++i) {
    int x = x0 + (x1 - x0) * i / steps;
    int y = y0 + (y1 - y0) * i / steps;
    for (int ty = -thickness / 2; ty <= thickness / 2; ++ty) {
      for (int tx = -thickness / 2; tx <= thickness / 2; ++tx) {
        int px = x + tx, py = y + ty;
        if (px >= 0 && px < w && py >= 0 && py < h) {
          uint8_t* p = img + (py * w + px) * 3;
          p[0] = b; p[1] = g; p[2] = r;
        }
      }
    }
  }
}

void synth_frame(uint8_t* img, int w, int h, int64_t frame_idx) {
  const int vp_x = static_cast<int>(w * 0.5);
  const int vp_y = static_cast<int>(h * 0.45);
  const int left_x = static_cast<int>(w * 0.15);
  const int right_x = static_cast<int>(w * 0.85);

  // Sky gradient then grass.
  for (int y = 0; y < vp_y; ++y) {
    int shade = 200 - 60 * y / vp_y;
    uint8_t bch = static_cast<uint8_t>(std::min(255, shade + 55));
    uint8_t gch = static_cast<uint8_t>(shade);
    uint8_t rch = static_cast<uint8_t>(std::max(0, shade - 30));
    uint8_t* row = img + y * w * 3;
    for (int x = 0; x < w; ++x) {
      row[x * 3 + 0] = bch; row[x * 3 + 1] = gch; row[x * 3 + 2] = rch;
    }
  }
  for (int y = vp_y; y < h; ++y) {
    uint8_t* row = img + y * w * 3;
    for (int x = 0; x < w; ++x) {
      row[x * 3 + 0] = 40; row[x * 3 + 1] = 110; row[x * 3 + 2] = 50;
    }
  }
  // Road trapezoid: for each row below the horizon interpolate edges.
  for (int y = vp_y; y < h; ++y) {
    double t = static_cast<double>(y - vp_y) / (h - vp_y);
    int lx = static_cast<int>(vp_x - 8 + t * ((left_x - 30) - (vp_x - 8)));
    int rx = static_cast<int>(vp_x + 8 + t * ((right_x + 30) - (vp_x + 8)));
    uint8_t* row = img + y * w * 3;
    for (int x = std::max(0, lx); x < std::min(w, rx); ++x) {
      row[x * 3 + 0] = 60; row[x * 3 + 1] = 60; row[x * 3 + 2] = 60;
    }
  }
  // Lane edge lines.
  draw_line(img, w, h, left_x, h - 1, vp_x, vp_y, 5, 240, 240, 240);
  draw_line(img, w, h, right_x, h - 1, vp_x, vp_y, 5, 240, 240, 240);

  // A drifting vehicle so frames are not static.
  double tt = frame_idx * 0.05;
  int depth_px = static_cast<int>(h - (0.45 + 0.2 * std::sin(tt)) * (h - vp_y));
  int cx = vp_x + static_cast<int>(60 * std::sin(tt * 0.7));
  int bw = 70, bh = 50;
  for (int y = std::max(0, depth_px - bh); y < std::min(h, depth_px); ++y) {
    for (int x = std::max(0, cx - bw / 2); x < std::min(w, cx + bw / 2); ++x) {
      uint8_t* p = img + (y * w + x) * 3;
      p[0] = 30; p[1] = 30; p[2] = 160;
    }
  }
}

void producer_synthetic(FrameRing* ring, int64_t num_frames) {
  for (int64_t i = 0; i < num_frames; ++i) {
    std::unique_lock<std::mutex> lk(ring->mu);
    ring->not_full.wait(lk, [&] { return ring->tail - ring->head < ring->slots || ring->done; });
    if (ring->done) return;
    int64_t slot = ring->tail;
    lk.unlock();

    synth_frame(ring->slot_ptr(slot), ring->width, ring->height, i);

    lk.lock();
    ring->slot_index[slot % ring->slots] = i;
    ring->tail++;
    ring->produced.fetch_add(1);
    ring->not_empty.notify_one();
  }
  std::lock_guard<std::mutex> lk(ring->mu);
  ring->done = true;
  ring->not_empty.notify_all();
}

void producer_rawfile(FrameRing* ring, std::string path, int64_t num_frames) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    std::lock_guard<std::mutex> lk(ring->mu);
    ring->done = true;
    ring->not_empty.notify_all();
    return;
  }
  for (int64_t i = 0; i < num_frames; ++i) {
    std::unique_lock<std::mutex> lk(ring->mu);
    ring->not_full.wait(lk, [&] { return ring->tail - ring->head < ring->slots || ring->done; });
    if (ring->done) break;
    int64_t slot = ring->tail;
    lk.unlock();

    size_t got = std::fread(ring->slot_ptr(slot), 1, ring->frame_bytes, f);
    bool ok = got == ring->frame_bytes;

    lk.lock();
    if (!ok) {
      ring->done = true;
      ring->not_empty.notify_all();
      break;
    }
    ring->slot_index[slot % ring->slots] = i;
    ring->tail++;
    ring->produced.fetch_add(1);
    ring->not_empty.notify_one();
  }
  std::fclose(f);
  std::lock_guard<std::mutex> lk(ring->mu);
  ring->done = true;
  ring->not_empty.notify_all();
}

}  // namespace

extern "C" {

FrameRing* ring_create(int width, int height, int slots) {
  auto* ring = new FrameRing();
  ring->width = width;
  ring->height = height;
  ring->slots = slots;
  ring->frame_bytes = static_cast<size_t>(width) * height * 3;
  ring->storage.resize(ring->frame_bytes * slots);
  ring->slot_index.assign(slots, -1);
  return ring;
}

void ring_start_synthetic(FrameRing* ring, int64_t num_frames) {
  ring->producer = std::thread(producer_synthetic, ring, num_frames);
}

void ring_start_rawfile(FrameRing* ring, const char* path, int64_t num_frames) {
  ring->producer = std::thread(producer_rawfile, ring, std::string(path), num_frames);
}

// Copy the next frame into out (H*W*3 bytes).  Returns the frame index, or
// -1 when the stream is exhausted, or -2 on timeout.
int64_t ring_next(FrameRing* ring, uint8_t* out, int timeout_ms) {
  std::unique_lock<std::mutex> lk(ring->mu);
  bool ok = ring->not_empty.wait_for(
      lk, std::chrono::milliseconds(timeout_ms),
      [&] { return ring->head < ring->tail || ring->done; });
  if (!ok) return -2;
  if (ring->head >= ring->tail && ring->done) return -1;
  int64_t slot = ring->head;
  int64_t idx = ring->slot_index[slot % ring->slots];
  std::memcpy(out, ring->slot_ptr(slot), ring->frame_bytes);
  ring->head++;
  ring->consumed.fetch_add(1);
  ring->not_full.notify_one();
  return idx;
}

// Drain up to n frames into a contiguous buffer; returns count copied.
int64_t ring_next_batch(FrameRing* ring, uint8_t* out, int64_t n, int timeout_ms) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t idx = ring_next(ring, out + i * ring->frame_bytes, timeout_ms);
    if (idx < 0) return i;
  }
  return n;
}

int64_t ring_produced(FrameRing* ring) { return ring->produced.load(); }
int64_t ring_consumed(FrameRing* ring) { return ring->consumed.load(); }

void ring_destroy(FrameRing* ring) {
  {
    std::lock_guard<std::mutex> lk(ring->mu);
    ring->done = true;
    ring->not_empty.notify_all();
    ring->not_full.notify_all();
  }
  if (ring->producer.joinable()) ring->producer.join();
  delete ring;
}

}  // extern "C"
