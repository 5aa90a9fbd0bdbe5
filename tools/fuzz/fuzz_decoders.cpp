// Hostile-input battery for the first-party decoders (ASAN/UBSAN lane).
//
// Every input file is fed to EVERY first-party decoder entry — wrong-codec
// data is exactly the hostile case — then deterministic mutation rounds
// (byte flips, truncations, length-field scrambles) of each seed are
// decoded the same way. Decode errors are fine; memory errors are not:
// the binary is built with -fsanitize=address,undefined and
// -fno-sanitize-recover, so any OOB read/write, UB shift, or overflow
// aborts with a report.
//
// The reference gets this hardening for free from Rust's memory safety
// (the one unsafe block is an ALSA FFI silencer, src/main.rs:93-109);
// the C++ runtime earns it here (SURVEY.md §5 race-detection/sanitizers;
// VERDICT r4 #8).
//
// Usage: fuzz_decoders [--mutants N] [--seed S] FILE...

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

struct DecodedWav {
  float* data;
  int64_t frames;
  int32_t channels;
  int32_t rate;
};

extern "C" {
int ss_decode_wav(const char* path, DecodedWav* out);
int ss_decode_flac(const char* path, DecodedWav* out);
int ss_decode_mp3(const char* path, DecodedWav* out);
int ss_decode_alac(const char* path, DecodedWav* out);
int ss_decode_vorbis(const char* path, DecodedWav* out);
int ss_decode_aac(const char* path, DecodedWav* out);
void ss_free_decoded(DecodedWav* d);
}

typedef int (*DecodeFn)(const char*, DecodedWav*);
static const struct { const char* name; DecodeFn fn; } kDecoders[] = {
    {"wav", ss_decode_wav},   {"flac", ss_decode_flac},
    {"mp3", ss_decode_mp3},   {"alac", ss_decode_alac},
    {"vorbis", ss_decode_vorbis}, {"aac", ss_decode_aac},
};

static uint64_t rng_state = 0x9e3779b97f4a7c15ull;
static uint64_t rnd() {  // splitmix64: deterministic across platforms
  uint64_t z = (rng_state += 0x9e3779b97f4a7c15ull);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  return z ^ (z >> 31);
}

static int decode_all(const char* path) {
  int decoded = 0;
  for (const auto& d : kDecoders) {
    DecodedWav out{};
    int rc = d.fn(path, &out);
    if (rc == 0) {
      // touch the output so ASAN sees any bad buffer end to end
      volatile float acc = 0.f;
      for (int64_t i = 0; i < out.frames * out.channels;
           i += (out.frames * out.channels) / 97 + 1)
        acc += out.data[i];
      (void)acc;
      ss_free_decoded(&out);
      decoded++;
    }
  }
  return decoded;
}

static std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = fopen(path, "rb");
  if (!f) return buf;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf.resize(n > 0 ? (size_t)n : 0);
  if (n > 0 && fread(buf.data(), 1, (size_t)n, f) != (size_t)n) buf.clear();
  fclose(f);
  return buf;
}

int main(int argc, char** argv) {
  int mutants = 0;
  uint64_t seed = 1;
  std::vector<const char*> files;
  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "--mutants") && i + 1 < argc)
      mutants = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--seed") && i + 1 < argc)
      seed = (uint64_t)atoll(argv[++i]);
    else
      files.push_back(argv[i]);
  }
  if (files.empty()) {
    fprintf(stderr, "usage: %s [--mutants N] [--seed S] FILE...\n", argv[0]);
    return 2;
  }

  const char* tmpdir = getenv("TMPDIR");
  std::string mut_path = std::string(tmpdir ? tmpdir : "/tmp") +
                         "/ss_fuzz_mutant.bin";

  long total = 0, ok = 0;
  for (const char* path : files) {
    ok += decode_all(path);
    total += 6;
    if (mutants <= 0) continue;
    std::vector<uint8_t> orig = read_file(path);
    if (orig.empty()) continue;
    rng_state = seed ^ (orig.size() * 0x100000001b3ull);
    for (int m = 0; m < mutants; m++) {
      std::vector<uint8_t> buf = orig;
      switch (rnd() % 4) {
        case 0:  // 1-8 random byte flips
          for (unsigned k = 0, nk = 1 + rnd() % 8; k < nk; k++)
            buf[rnd() % buf.size()] ^= (uint8_t)(1u << (rnd() % 8));
          break;
        case 1:  // truncate to a random prefix
          buf.resize(1 + rnd() % buf.size());
          break;
        case 2:  // scramble a random aligned u32 (length/size fields)
          if (buf.size() >= 4) {
            size_t off = (rnd() % (buf.size() / 4)) * 4;
            uint32_t v = (uint32_t)rnd();
            memcpy(&buf[off], &v, 4);
          }
          break;
        case 3:  // splice a window from elsewhere in the file
          if (buf.size() >= 64) {
            size_t w = 8 + rnd() % 48;
            size_t src = rnd() % (buf.size() - w);
            size_t dst = rnd() % (buf.size() - w);
            memmove(&buf[dst], &buf[src], w);
          }
          break;
      }
      FILE* f = fopen(mut_path.c_str(), "wb");
      if (!f) { perror("mutant tmp"); return 2; }
      fwrite(buf.data(), 1, buf.size(), f);
      fclose(f);
      ok += decode_all(mut_path.c_str());
      total += 6;
    }
  }
  printf("fuzz_decoders: %ld decode attempts, %ld succeeded, 0 sanitizer "
         "reports\n", total, ok);
  return 0;
}
