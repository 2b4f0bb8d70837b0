// Threaded prefetching frame loader: decodes rgb/depth/pcd files ahead
// of the consumer so host decode overlaps device compute — the runtime
// role the reference leaves to synchronous per-frame imread/loadPCDFile
// calls in its frame loop (src/GraphicEnd.cpp:266-302).
//
// Design: a fixed ring of slots; worker threads claim file indices in
// order, decode into their slot, and the consumer blocks on the next
// in-order slot. Bounded memory, in-order delivery, C ABI for ctypes.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int slam3d_png_decode(const uint8_t* data, int64_t n, uint8_t* out,
                      int to_gray);
int slam3d_png_info(const uint8_t* data, int64_t n, uint32_t* w, uint32_t* h,
                    uint32_t* channels, uint32_t* bitdepth);
int64_t slam3d_pcd_read(const uint8_t* data, int64_t n, float* xyz,
                        uint32_t* rgba);
int64_t slam3d_pcd_points(const uint8_t* data, int64_t n);
}

namespace {

enum Mode { kGray8 = 0, kDepth16 = 1, kPcd = 2 };

std::vector<uint8_t> read_file(const std::string& path) {
  std::vector<uint8_t> buf;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf.resize(size_t(n));
  if (std::fread(buf.data(), 1, size_t(n), f) != size_t(n)) buf.clear();
  std::fclose(f);
  return buf;
}

struct Slot {
  std::vector<uint8_t> data;  // decoded payload
  int64_t payload = 0;        // bytes (or point count for pcd)
  int status = 0;             // 0 empty, 1 ready, 2 failed
};

struct Loader {
  std::vector<std::string> paths;
  Mode mode;
  int64_t item_bytes;  // capacity per slot
  uint32_t expect_w = 0, expect_h = 0;  // 0 = don't check
  int depth;
  std::vector<Slot> slots;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::atomic<int64_t> next_claim{0};
  int64_t next_consume = 0;
  bool stop = false;

  void work() {
    for (;;) {
      int64_t i = next_claim.fetch_add(1);
      if (i >= int64_t(paths.size())) return;
      // wait until slot i's ring position is free
      Slot* s = &slots[size_t(i % depth)];
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] {
          return stop || (i - next_consume < int64_t(depth) && s->status == 0);
        });
        if (stop) return;
      }
      auto raw = read_file(paths[size_t(i)]);
      int ok = -1;
      int64_t payload = 0;
      if (!raw.empty()) {
        if (mode == kPcd) {
          int64_t npts = slam3d_pcd_points(raw.data(), int64_t(raw.size()));
          int64_t need = npts * (3 * 4 + 4);
          if (npts > 0 && need <= item_bytes) {
            float* xyz = reinterpret_cast<float*>(s->data.data());
            uint32_t* rgba =
                reinterpret_cast<uint32_t*>(s->data.data() + npts * 12);
            ok = slam3d_pcd_read(raw.data(), int64_t(raw.size()), xyz, rgba) ==
                         npts
                     ? 0
                     : -1;
            payload = npts;
          }
        } else {
          uint32_t w, h, ch, bd;
          if (slam3d_png_info(raw.data(), int64_t(raw.size()), &w, &h, &ch,
                              &bd) == 0) {
            // slam3d_png_decode writes per the file's *actual*
            // channels/bitdepth, so the mode must be validated before
            // decoding into the fixed-size slot (else heap overflow):
            //  kGray8:  8-bit, 1ch (raw copy) or >=3ch (to_gray) -> w*h
            //  kDepth16: 16-bit single channel              -> w*h*2
            bool fmt_ok =
                (mode == kGray8)
                    ? (bd == 8 && (ch == 1 || ch >= 3))
                    : (bd == 16 && ch == 1);
            bool dims_ok = (expect_w == 0 || w == expect_w) &&
                           (expect_h == 0 || h == expect_h);
            int64_t need = (mode == kGray8) ? int64_t(w) * h
                                            : int64_t(w) * h * 2;
            if (fmt_ok && dims_ok && need <= item_bytes) {
              ok = slam3d_png_decode(raw.data(), int64_t(raw.size()),
                                     s->data.data(), mode == kGray8 ? 1 : 0);
              payload = need;
            }
          }
        }
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        s->payload = payload;
        s->status = ok == 0 ? 1 : 2;
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// paths: NUL-separated concatenation. expect_w/expect_h: required
// decoded dimensions for image modes (0 = accept any that fits).
// Returns opaque handle.
void* slam3d_loader_create(const char* paths_blob, int64_t blob_len,
                           int n_paths, int mode, int64_t item_bytes,
                           int queue_depth, int n_threads, int expect_w,
                           int expect_h) {
  auto* L = new Loader();
  L->mode = Mode(mode);
  L->item_bytes = item_bytes;
  L->expect_w = uint32_t(expect_w > 0 ? expect_w : 0);
  L->expect_h = uint32_t(expect_h > 0 ? expect_h : 0);
  L->depth = queue_depth;
  const char* p = paths_blob;
  const char* end = paths_blob + blob_len;
  for (int i = 0; i < n_paths && p < end; ++i) {
    L->paths.emplace_back(p);
    p += L->paths.back().size() + 1;
  }
  L->slots.resize(size_t(queue_depth));
  for (auto& s : L->slots) s.data.resize(size_t(item_bytes));
  for (int t = 0; t < n_threads; ++t) {
    L->workers.emplace_back([L] { L->work(); });
  }
  return L;
}

// Blocks for the next in-order item. Copies payload into out.
// Returns payload size (bytes, or points for pcd mode); -1 end of
// stream; -2 decode failure for this item.
int64_t slam3d_loader_next(void* handle, uint8_t* out) {
  auto* L = static_cast<Loader*>(handle);
  if (L->next_consume >= int64_t(L->paths.size())) return -1;
  Slot* s = &L->slots[size_t(L->next_consume % L->depth)];
  int64_t payload;
  int status;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] { return s->status != 0; });
    status = s->status;
    payload = s->payload;
    if (status == 1 && out) {
      int64_t bytes =
          L->mode == kPcd ? payload * 16 : payload;
      std::memcpy(out, s->data.data(), size_t(bytes));
    }
    s->status = 0;
    L->next_consume++;
  }
  L->cv_free.notify_all();
  return status == 1 ? payload : -2;
}

void slam3d_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_free.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
