// dfqrt — native int8 inference runtime for dfq_tpu artifacts.
//
// The deployment-side equivalent of the reference's ncnn backend
// (/root/reference/convert_ncnn.py + inference_cls.cpp): loads the
// .dfqparam/.dfqbin pair exported by dfq_tpu.io.native_export and runs
// true int8 inference on CPU (int8 x int8 -> int32 accumulation,
// per-output-channel weight scales, zero-point folding, OpenMP).

#pragma once

#include <cstddef>

extern "C" {

// Returns an opaque model handle, or nullptr on failure.
void *dfqrt_load(const char *param_path, const char *bin_path);
void dfqrt_free(void *handle);

// Run a forward pass on an NHWC float32 input. Returns 0 on success.
int dfqrt_forward(void *handle, const float *input, const int *dims, int ndim);

int dfqrt_num_outputs(void *handle);
int dfqrt_output_ndim(void *handle, int index);
void dfqrt_output_dims(void *handle, int index, int *dims_out);
void dfqrt_output_data(void *handle, int index, float *data_out);

// Human-readable description of the last error (thread-unsafe, debug aid).
const char *dfqrt_last_error();

}  // extern "C"
