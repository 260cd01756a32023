// Native data-loading core: tokenization, vocab lookup, batch encoding.
//
// The reference delegates all data work to torchtext/torch (SURVEY.md §2.3);
// this library provides the hot host-side path natively so batch prep never
// competes with the Python interpreter while the TPU is consuming batches:
//   - whitespace tokenization of pre-BPE'd lines,
//   - vocab lookup (open-addressing hash, unk default — torchtext Vocab
//     semantics: specials at fixed ids, set_default_index(<unk>)),
//   - BOS/EOS wrap + pad/truncate-keeping-EOS to a fixed max_padding
//     (collate_batch, iwslt14_train.py:225-285),
//   - length scans for token bucketing (batch_size_fn, train.py:48-58).
//
// C ABI for ctypes; no Python.h dependency.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> stoi;
  int32_t default_index;
};

inline void encode_line(const Vocab& v, const char* line, int32_t max_padding,
                        int32_t bos, int32_t eos, int32_t pad, int32_t* out) {
  std::vector<int32_t> ids;
  ids.reserve(64);
  ids.push_back(bos);
  const char* p = line;
  while (*p) {
    while (*p == ' ' || *p == '\t') ++p;
    const char* start = p;
    while (*p && *p != ' ' && *p != '\t') ++p;
    if (p > start) {
      std::string tok(start, p - start);
      auto it = v.stoi.find(tok);
      ids.push_back(it == v.stoi.end() ? v.default_index : it->second);
    }
  }
  ids.push_back(eos);
  // truncate keeping EOS (dataset.py encode_sentence semantics)
  if ((int32_t)ids.size() > max_padding) {
    ids.resize(max_padding);
    ids[max_padding - 1] = eos;
  }
  int32_t i = 0;
  for (; i < (int32_t)ids.size(); ++i) out[i] = ids[i];
  for (; i < max_padding; ++i) out[i] = pad;
}

}  // namespace

extern "C" {

void* otx_vocab_create(const char** tokens, int32_t n, int32_t default_index) {
  auto* v = new Vocab();
  v->stoi.reserve(n * 2);
  for (int32_t i = 0; i < n; ++i) v->stoi.emplace(tokens[i], i);
  v->default_index = default_index;
  return v;
}

void otx_vocab_free(void* vocab) { delete static_cast<Vocab*>(vocab); }

int32_t otx_vocab_size(void* vocab) {
  return (int32_t)static_cast<Vocab*>(vocab)->stoi.size();
}

int32_t otx_vocab_lookup(void* vocab, const char* token) {
  auto* v = static_cast<Vocab*>(vocab);
  auto it = v->stoi.find(token);
  return it == v->stoi.end() ? v->default_index : it->second;
}

// Encode n_lines raw lines into out[n_lines * max_padding] int32.
void otx_encode_batch(void* vocab, const char** lines, int32_t n_lines,
                      int32_t max_padding, int32_t bos, int32_t eos,
                      int32_t pad, int32_t* out) {
  auto* v = static_cast<Vocab*>(vocab);
  for (int32_t i = 0; i < n_lines; ++i) {
    encode_line(*v, lines[i], max_padding, bos, eos, pad, out + (int64_t)i * max_padding);
  }
}

// Whitespace token count per line (for bucketing keys).
void otx_line_lengths(const char** lines, int32_t n, int32_t* out) {
  for (int32_t i = 0; i < n; ++i) {
    const char* p = lines[i];
    int32_t count = 0;
    while (*p) {
      while (*p == ' ' || *p == '\t') ++p;
      if (*p) {
        ++count;
        while (*p && *p != ' ' && *p != '\t') ++p;
      }
    }
    out[i] = count;
  }
}

// Pad-mask construction: out[i] = (ids[i] != pad).
void otx_pad_mask(const int32_t* ids, int64_t n, int32_t pad, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = ids[i] != pad;
}

}  // extern "C"
