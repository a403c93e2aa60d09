// Native host-side data loader for summarymixing_tpu.
//
// The reference's host data path leans on C++ through torchaudio/sox
// (speed perturb decode) and SentencePiece; the TPU build's equivalent hot
// path is batch WAV decode + padding, which this library does with a thread
// pool so the input pipeline keeps up with the accelerator
// (SURVEY.md §2.3 "data-loader" native touchpoint).
//
// C ABI (ctypes-friendly):
//   load_wav_batch(paths, n, out, max_len, lengths, expected_rate, threads)
//     paths:    array of n C strings (16-bit PCM mono/stereo RIFF WAV)
//     out:      float32 buffer [n * max_len], zero-padded, in [-1, 1]
//     lengths:  int32[n] decoded sample counts (clipped to max_len)
//     returns:  0 on success, else the 1-based index of the first bad file
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread dataloader.cpp -o libdataloader.so

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
  uint16_t bits = 0;
  long data_offset = 0;
  uint32_t data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return false;
  if (fread(&riff_size, 4, 1, f) != 1) return false;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return false;

  bool have_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) return false;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint16_t fmt;
      uint32_t rate, byte_rate;
      uint16_t block, bits, channels;
      if (fread(&fmt, 2, 1, f) != 1) return false;
      if (fread(&channels, 2, 1, f) != 1) return false;
      if (fread(&rate, 4, 1, f) != 1) return false;
      if (fread(&byte_rate, 4, 1, f) != 1) return false;
      if (fread(&block, 2, 1, f) != 1) return false;
      if (fread(&bits, 2, 1, f) != 1) return false;
      if (fmt != 1 && fmt != 0xFFFE) return false;  // PCM only
      info->channels = channels;
      info->sample_rate = rate;
      info->bits = bits;
      if (size > 16 && fseek(f, size - 16, SEEK_CUR) != 0) return false;
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = size;
      return have_fmt;
    } else {
      if (fseek(f, (size + 1) & ~1u, SEEK_CUR) != 0) return false;
    }
  }
}

// decode one file into out[0..max_len), return samples written or -1
int64_t decode_one(const char* path, float* out, int64_t max_len,
                   int expected_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info) || info.bits != 16 || info.channels == 0 ||
      (expected_rate > 0 && (int)info.sample_rate != expected_rate)) {
    fclose(f);
    return -1;
  }
  const int ch = info.channels;
  int64_t n_frames = info.data_bytes / (2 * ch);
  if (n_frames > max_len) n_frames = max_len;

  std::vector<int16_t> buf(static_cast<size_t>(n_frames) * ch);
  if (fseek(f, info.data_offset, SEEK_SET) != 0 ||
      fread(buf.data(), 2, buf.size(), f) != buf.size()) {
    fclose(f);
    return -1;
  }
  fclose(f);

  const float scale = 1.0f / 32768.0f;
  if (ch == 1) {
    for (int64_t i = 0; i < n_frames; ++i) out[i] = buf[i] * scale;
  } else {
    const float inv_ch = 1.0f / ch;
    for (int64_t i = 0; i < n_frames; ++i) {
      int32_t acc = 0;
      for (int c = 0; c < ch; ++c) acc += buf[i * ch + c];
      out[i] = acc * scale * inv_ch;
    }
  }
  return n_frames;
}

}  // namespace

extern "C" {

int load_wav_batch(const char** paths, int n, float* out, int64_t max_len,
                   int32_t* lengths, int expected_rate, int num_threads) {
  if (num_threads <= 0) {
    num_threads = (int)std::thread::hardware_concurrency();
    if (num_threads <= 0) num_threads = 4;
  }
  if (num_threads > n) num_threads = n > 0 ? n : 1;

  std::atomic<int> next(0);
  std::atomic<int> first_error(0);  // 0 = ok, else 1-based index

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      float* dst = out + (int64_t)i * max_len;
      memset(dst, 0, sizeof(float) * max_len);
      int64_t got = decode_one(paths[i], dst, max_len, expected_rate);
      if (got < 0) {
        int expected = 0;
        first_error.compare_exchange_strong(expected, i + 1);
        lengths[i] = 0;
      } else {
        lengths[i] = (int32_t)got;
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return first_error.load();
}

}  // extern "C"
