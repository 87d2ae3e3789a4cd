// Native runtime helpers for tinyllama-tpu, exposed via a C ABI (ctypes).
//
// Two jobs the Python layer is slow at, both host-side (the TPU compute
// path is JAX/XLA/Pallas — this library is the *runtime* around it, the
// analog of the reference's C++ host code):
//
//  1. gten checkpoint payload decoding: the .gten quantized payloads are
//     arrays of interleaved block structs ([f16 delta | values], see
//     /root/reference/gten/quants.h:17-31). Deinterleaving GBs of these
//     and repacking int4 nibbles into the TPU group-planar layout
//     (tinyllama_tpu/quant/codec.py) is a tight byte loop.
//
//  2. BPE tokenizer encode: the greedy best-pair merge loop is O(n^2)
//     byte-string churn (reference: /root/reference/tokenizer.h:252-280,
//     behavior reimplemented, not copied: hash-map lookup instead of
//     qsort/bsearch).
//
// Build: `make -C native` -> libtinyllama_native.so. Python bindings with
// pure-Python fallback live in tinyllama_tpu/native.py.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// gten payload decoding
// ---------------------------------------------------------------------------

// Q8 payload: n_blocks x [2-byte f16 delta][32 x int8] -> planar values +
// f16 deltas (as raw u16; Python upcasts to f32).
void q8_deinterleave(const uint8_t* payload, int64_t n_blocks,
                     int8_t* out_vals, uint16_t* out_deltas) {
  constexpr int64_t kBlock = 32;
  constexpr int64_t kStride = 2 + kBlock;
  for (int64_t b = 0; b < n_blocks; ++b) {
    const uint8_t* rec = payload + b * kStride;
    std::memcpy(out_deltas + b, rec, 2);
    std::memcpy(out_vals + b * kBlock, rec + 2, kBlock);
  }
}

// Q4 payload: n_blocks x [2-byte f16 delta][16 bytes], where byte j packs
// element j (high nibble) and element j+16 (low nibble) of the 32-block
// (gten layout, quants.h:78-90 / tinyllama_to_gten.py:83-89).
// Emits offset-7 nibble values (one byte each) + deltas; Python repacks to
// the TPU group-planar layout (or use q4_gten_to_planar below).
void q4_unpack_gten(const uint8_t* payload, int64_t n_blocks,
                    uint8_t* out_vals, uint16_t* out_deltas) {
  constexpr int64_t kBlock = 32;
  constexpr int64_t kHalf = 16;
  constexpr int64_t kStride = 2 + kHalf;
  for (int64_t b = 0; b < n_blocks; ++b) {
    const uint8_t* rec = payload + b * kStride;
    std::memcpy(out_deltas + b, rec, 2);
    uint8_t* dst = out_vals + b * kBlock;
    const uint8_t* q = rec + 2;
    for (int64_t j = 0; j < kHalf; ++j) {
      dst[j] = q[j] >> 4;
      dst[j + kHalf] = q[j] & 0x0F;
    }
  }
}

// Full gten->TPU repack for one q4 tensor: payload covering d_out rows of
// d_in elements -> group-planar packed int8 [d_out, d_in/2] + deltas
// [d_out * d_in/32]. `group` is q4_group_size(d_in).
void q4_gten_to_planar(const uint8_t* payload, int64_t d_out, int64_t d_in,
                       int64_t group, int8_t* out_packed,
                       uint16_t* out_deltas) {
  constexpr int64_t kBlock = 32;
  constexpr int64_t kStride = 2 + kBlock / 2;
  const int64_t blocks_per_row = d_in / kBlock;
  const int64_t half_group = group / 2;
  std::vector<uint8_t> row(d_in);
  for (int64_t r = 0; r < d_out; ++r) {
    const uint8_t* rec = payload + r * blocks_per_row * kStride;
    for (int64_t b = 0; b < blocks_per_row; ++b) {
      std::memcpy(out_deltas + r * blocks_per_row + b, rec + b * kStride, 2);
      const uint8_t* q = rec + b * kStride + 2;
      uint8_t* dst = row.data() + b * kBlock;
      for (int64_t j = 0; j < 16; ++j) {
        dst[j] = q[j] >> 4;
        dst[j + 16] = q[j] & 0x0F;
      }
    }
    int8_t* out_row = out_packed + r * (d_in / 2);
    for (int64_t g = 0; g < d_in / group; ++g) {
      const uint8_t* src = row.data() + g * group;
      int8_t* dst = out_row + g * half_group;
      for (int64_t j = 0; j < half_group; ++j) {
        dst[j] = static_cast<int8_t>((src[j] << 4) | (src[j + half_group] & 0x0F));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// BPE tokenizer
// ---------------------------------------------------------------------------

struct Tokenizer {
  std::vector<std::string> vocab;
  std::vector<float> scores;
  std::unordered_map<std::string, int> lookup;
  uint32_t max_token_length = 0;
};

void* tok_create(const char* path, int vocab_size) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* tok = new Tokenizer();
  if (std::fread(&tok->max_token_length, 4, 1, f) != 1) {
    std::fclose(f);
    delete tok;
    return nullptr;
  }
  tok->vocab.reserve(vocab_size);
  tok->scores.reserve(vocab_size);
  for (int i = 0; i < vocab_size; ++i) {
    float score;
    int32_t len;
    if (std::fread(&score, 4, 1, f) != 1 || std::fread(&len, 4, 1, f) != 1) {
      std::fclose(f);
      delete tok;
      return nullptr;
    }
    std::string piece(len, '\0');
    if (len > 0 && std::fread(piece.data(), len, 1, f) != 1) {
      std::fclose(f);
      delete tok;
      return nullptr;
    }
    tok->scores.push_back(score);
    tok->vocab.push_back(piece);
    tok->lookup.emplace(std::move(piece), i);  // first id wins on duplicates
  }
  std::fclose(f);
  return tok;
}

void tok_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

int tok_piece(void* handle, int token, const char** out_ptr) {
  auto* tok = static_cast<Tokenizer*>(handle);
  if (token < 0 || token >= static_cast<int>(tok->vocab.size())) return -1;
  *out_ptr = tok->vocab[token].data();
  return static_cast<int>(tok->vocab[token].size());
}

// Greedy BPE encode of raw bytes (dummy-prefix + byte-fallback + merge
// loop; behavioral parity with tokenizer.h:172-283). Returns the token
// count, or -1 if out_cap is too small.
int tok_encode_raw(void* handle, const char* text, int text_len,
                   int* out_tokens, int out_cap) {
  auto* tok = static_cast<Tokenizer*>(handle);
  std::vector<int> tokens;
  tokens.reserve(text_len + 1);

  if (text_len > 0) {
    auto it = tok->lookup.find(" ");
    if (it != tok->lookup.end()) tokens.push_back(it->second);  // dummy prefix
  }

  // UTF-8 codepoint grouping with byte fallback (+3).
  int i = 0;
  while (i < text_len) {
    int j = i + 1;
    while (j < text_len && (static_cast<uint8_t>(text[j]) & 0xC0) == 0x80 &&
           (j - i) < 4) {
      ++j;
    }
    std::string chunk(text + i, text + j);
    auto it = tok->lookup.find(chunk);
    if (it != tok->lookup.end()) {
      tokens.push_back(it->second);
    } else {
      for (int b = i; b < j; ++b) {
        tokens.push_back(static_cast<uint8_t>(text[b]) + 3);
      }
    }
    i = j;
  }

  // Greedy highest-score adjacent-pair merge.
  std::string merged;
  while (true) {
    float best_score = -1e10f;
    int best_id = -1;
    size_t best_idx = 0;
    for (size_t k = 0; k + 1 < tokens.size(); ++k) {
      merged = tok->vocab[tokens[k]];
      merged += tok->vocab[tokens[k + 1]];
      auto it = tok->lookup.find(merged);
      if (it != tok->lookup.end() && tok->scores[it->second] > best_score) {
        best_score = tok->scores[it->second];
        best_id = it->second;
        best_idx = k;
      }
    }
    if (best_id == -1) break;
    tokens[best_idx] = best_id;
    tokens.erase(tokens.begin() + best_idx + 1);
  }

  if (static_cast<int>(tokens.size()) > out_cap) return -1;
  std::memcpy(out_tokens, tokens.data(), tokens.size() * sizeof(int));
  return static_cast<int>(tokens.size());
}

}  // extern "C"
