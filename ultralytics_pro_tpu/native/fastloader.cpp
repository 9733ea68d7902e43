// Native multithreaded image loader: decode + letterbox in C++ (OpenCV C++),
// the TPU-native equivalent of the reference's torch-DataLoader C++ worker
// pool (SURVEY §2.9 host pipeline row; reference delegates to torch's native
// loader + cv2 — here the decode/letterbox batch is one C call).
//
// Letterbox math matches data/augment.py LetterBox EXACTLY (r = min(s/h, s/w),
// optional no-scaleup, round(dim*r) unpad, centered pad with the
// round(d -/+ 0.1) rule, BORDER_CONSTANT 114) so labels rescale identically.
//
// C API (ctypes-friendly):
//   void* fl_create(int imgsz, int nthreads, int scaleup, int pad_value);
//   int   fl_load_batch(void* h, const char** paths, int n,
//                       unsigned char* out,   // (n, imgsz, imgsz, 3) BGR
//                       float* meta);         // (n, 5): h0, w0, r, dw, dh
//   void  fl_destroy(void* h);
// Returns number of successfully decoded images; failures leave a zero image
// and meta h0 = 0.

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <atomic>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Loader {
  int imgsz;
  int nthreads;
  bool scaleup;
  int pad_value;
};

void load_one(const Loader& L, const char* path, unsigned char* out, float* meta) {
  const int s = L.imgsz;
  std::memset(out, 0, static_cast<size_t>(s) * s * 3);
  meta[0] = 0.f; meta[1] = 0.f; meta[2] = 1.f; meta[3] = 0.f; meta[4] = 0.f;
  cv::Mat im = cv::imread(path, cv::IMREAD_COLOR);
  if (im.empty()) return;
  const int h0 = im.rows, w0 = im.cols;
  double r = std::min(static_cast<double>(s) / h0, static_cast<double>(s) / w0);
  if (!L.scaleup) r = std::min(r, 1.0);
  const int nw = static_cast<int>(std::lround(w0 * r));
  const int nh = static_cast<int>(std::lround(h0 * r));
  double dw = (s - nw) / 2.0, dh = (s - nh) / 2.0;
  cv::Mat resized;
  if (nw != w0 || nh != h0)
    cv::resize(im, resized, cv::Size(nw, nh), 0, 0, cv::INTER_LINEAR);
  else
    resized = im;
  const int top = static_cast<int>(std::lround(dh - 0.1));
  const int left = static_cast<int>(std::lround(dw - 0.1));
  cv::Mat canvas(s, s, CV_8UC3, cv::Scalar(L.pad_value, L.pad_value, L.pad_value));
  resized.copyTo(canvas(cv::Rect(left, top, nw, nh)));
  // canvas is contiguous (freshly allocated)
  std::memcpy(out, canvas.data, static_cast<size_t>(s) * s * 3);
  meta[0] = static_cast<float>(h0);
  meta[1] = static_cast<float>(w0);
  meta[2] = static_cast<float>(r);
  meta[3] = static_cast<float>(dw);
  meta[4] = static_cast<float>(dh);
}

}  // namespace

extern "C" {

void* fl_create(int imgsz, int nthreads, int scaleup, int pad_value) {
  auto* L = new Loader{imgsz, nthreads > 0 ? nthreads : 4, scaleup != 0, pad_value};
  return L;
}

int fl_load_batch(void* h, const char** paths, int n, unsigned char* out, float* meta) {
  const Loader& L = *static_cast<Loader*>(h);
  const size_t stride = static_cast<size_t>(L.imgsz) * L.imgsz * 3;
  std::atomic<int> next{0}, ok{0};
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      load_one(L, paths[i], out + stride * i, meta + 5 * i);
      if (meta[5 * i] > 0.f) ok.fetch_add(1);
    }
  };
  const int t = std::min(L.nthreads, n);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return ok.load();
}

void fl_destroy(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
