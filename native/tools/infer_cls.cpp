// ImageNet classification eval on the native int8 runtime.
//
// Mirrors the reference ncnn eval binary behavior
// (/root/reference/inference_cls.cpp): walk a folder-per-class val
// directory, resize short side to 256, center-crop 224, normalize with
// ImageNet mean/std, run the int8 model, accumulate top-1.
//
// Usage: dfq_infer_cls <model_prefix> <val_dir> [limit]

#include <dirent.h>
#include <sys/stat.h>

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <string>
#include <vector>

#include "../src/dfqrt.h"

static const float kMean[3] = {0.485f, 0.456f, 0.406f};
static const float kStd[3] = {0.229f, 0.224f, 0.225f};

static std::vector<std::string> list_dir(const std::string &path, bool dirs) {
  std::vector<std::string> out;
  DIR *d = opendir(path.c_str());
  if (!d) return out;
  dirent *e;
  while ((e = readdir(d)) != nullptr) {
    std::string name = e->d_name;
    if (name == "." || name == "..") continue;
    struct stat st;
    std::string full = path + "/" + name;
    if (stat(full.c_str(), &st) != 0) continue;
    if (dirs == static_cast<bool>(S_ISDIR(st.st_mode))) out.push_back(name);
  }
  closedir(d);
  std::sort(out.begin(), out.end());
  return out;
}

int main(int argc, char **argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <model_prefix> <val_dir> [limit]\n", argv[0]);
    return 2;
  }
  const std::string prefix = argv[1];
  const std::string val_dir = argv[2];
  const long limit = argc > 3 ? std::atol(argv[3]) : -1;

  void *model = dfqrt_load((prefix + ".dfqparam").c_str(),
                           (prefix + ".dfqbin").c_str());
  if (!model) {
    std::fprintf(stderr, "load failed: %s\n", dfqrt_last_error());
    return 1;
  }

  std::vector<std::string> classes = list_dir(val_dir, true);
  long correct = 0, total = 0;
  std::vector<float> input(224 * 224 * 3);
  std::vector<float> logits;

  for (size_t ci = 0; ci < classes.size(); ++ci) {
    for (const auto &fname : list_dir(val_dir + "/" + classes[ci], false)) {
      if (limit > 0 && total >= limit) break;
      cv::Mat img = cv::imread(val_dir + "/" + classes[ci] + "/" + fname);
      if (img.empty()) continue;
      // resize short side to 256, center crop 224 (inference_cls.cpp:128-130)
      const int short_side = std::min(img.cols, img.rows);
      const double scale = 256.0 / short_side;
      cv::resize(img, img, cv::Size(), scale, scale, cv::INTER_LINEAR);
      const int x0 = (img.cols - 224) / 2, y0 = (img.rows - 224) / 2;
      img = img(cv::Rect(x0, y0, 224, 224)).clone();
      cv::cvtColor(img, img, cv::COLOR_BGR2RGB);

      for (int i = 0; i < 224; ++i)
        for (int j = 0; j < 224; ++j) {
          const cv::Vec3b px = img.at<cv::Vec3b>(i, j);
          for (int c = 0; c < 3; ++c)
            input[(i * 224 + j) * 3 + c] =
                (px[c] / 255.0f - kMean[c]) / kStd[c];
        }

      const int dims[4] = {1, 224, 224, 3};
      if (dfqrt_forward(model, input.data(), dims, 4) != 0) {
        std::fprintf(stderr, "forward failed: %s\n", dfqrt_last_error());
        return 1;
      }
      int odims[8] = {0};
      dfqrt_output_dims(model, 0, odims);
      const int n_cls = odims[1];
      logits.resize(n_cls);
      dfqrt_output_data(model, 0, logits.data());
      const int pred = static_cast<int>(
          std::max_element(logits.begin(), logits.end()) - logits.begin());
      correct += (pred == static_cast<int>(ci));
      total += 1;
      if (total % 1000 == 0)
        std::printf("%ld images, top-1 %.4f\n", total,
                    static_cast<double>(correct) / total);
    }
  }
  std::printf("top-1: %.4f (%ld/%ld)\n",
              total ? static_cast<double>(correct) / total : 0.0, correct,
              total);
  dfqrt_free(model);
  return 0;
}
