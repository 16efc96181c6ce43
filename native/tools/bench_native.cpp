// Throughput benchmark for the native int8 runtime (dfqrt).
//
// The reference deploys through ncnn and publishes that backend as a
// first-class target (/root/reference/inference_cls.cpp:133-139, 2
// threads); this gives dfqrt the matching PERF row: img/s on synthetic
// 224^2 inputs (no dataset / imread in the loop — pure runtime time,
// the eval binary's preprocess cost is its own line there).
//
// Usage: dfq_bench_native <model_prefix> [iters=50] [H=224] [W=224]
// Thread count comes from OMP_NUM_THREADS (the runtime's only knob,
// like ncnn's set_num_threads). Prints one JSON line.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "../src/dfqrt.h"

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <model_prefix> [iters] [H] [W]\n", argv[0]);
    return 2;
  }
  const std::string prefix = argv[1];
  const int iters = argc > 2 ? std::atoi(argv[2]) : 50;
  const int H = argc > 3 ? std::atoi(argv[3]) : 224;
  const int W = argc > 4 ? std::atoi(argv[4]) : H;

  void *model = dfqrt_load((prefix + ".dfqparam").c_str(),
                           (prefix + ".dfqbin").c_str());
  if (!model) {
    std::fprintf(stderr, "load failed: %s\n", dfqrt_last_error());
    return 1;
  }

  std::vector<float> input(static_cast<size_t>(H) * W * 3);
  // deterministic pseudo-random input in the model's clipped range
  unsigned s = 12345;
  for (auto &v : input) {
    s = s * 1664525u + 1013904223u;
    v = (static_cast<float>(s >> 8) / 8388608.0f - 1.0f) * 2.0f;
  }
  const int dims[4] = {1, H, W, 3};

  for (int i = 0; i < 3; ++i)  // warmup
    if (dfqrt_forward(model, input.data(), dims, 4) != 0) {
      std::fprintf(stderr, "forward failed: %s\n", dfqrt_last_error());
      return 1;
    }

  const auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; ++i)
    dfqrt_forward(model, input.data(), dims, 4);
  const auto t1 = std::chrono::steady_clock::now();
  const double sec =
      std::chrono::duration_cast<std::chrono::duration<double>>(t1 - t0)
          .count();

  int odims[8] = {0};
  dfqrt_output_dims(model, 0, odims);
  std::vector<float> out(static_cast<size_t>(odims[0]) *
                         (odims[1] > 0 ? odims[1] : 1) *
                         (odims[2] > 0 ? odims[2] : 1) *
                         (odims[3] > 0 ? odims[3] : 1));
  dfqrt_output_data(model, 0, out.data());
  bool finite = true;
  for (float v : out) finite = finite && std::isfinite(v);

  const char *omp = std::getenv("OMP_NUM_THREADS");
  std::printf(
      "{\"model\": \"%s\", \"iters\": %d, \"input\": [1, %d, %d, 3], "
      "\"omp_threads\": \"%s\", \"ms_per_image\": %.2f, "
      "\"images_per_s\": %.2f, \"finite\": %s}\n",
      prefix.c_str(), iters, H, W, omp ? omp : "default", sec / iters * 1e3,
      iters / sec, finite ? "true" : "false");
  dfqrt_free(model);
  return 0;
}
