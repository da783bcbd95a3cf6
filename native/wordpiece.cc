// Native WordPiece tokenizer core.
//
// The reference tokenized through HuggingFace's Rust `tokenizers` binding
// (reference: pyproject.toml:12-13); this is the framework's first-party
// native equivalent: BERT basic tokenization (ASCII lowercase + punctuation
// split) followed by greedy longest-match WordPiece, exposed through a
// minimal C ABI consumed via ctypes (sskd_tpu/tokenization/native.py).
//
// Scope note: operates on bytes; the Python binding routes only ASCII text
// here (hot path for MS MARCO-class corpora) and falls back to the pure
// Python implementation for non-ASCII input, where code-point offsets
// matter. Semantics for ASCII input are bit-identical to the Python
// tokenizer (pinned by tests/test_native_tokenizer.py).
//
// Build: make -C native   (emits libwordpiece.so)

#include <algorithm>
#include <atomic>
#include <cstddef>
#include <cstring>
#include <string>
#include <string_view>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// Heterogeneous lookup (C++20): find(string_view) without materializing a
// std::string. The greedy matcher probes O(word_len) candidate pieces per
// word position; with plain std::string keys every probe paid a substr +
// "##"-concat allocation — measured as ~80% of tokenize time (602 docs/s).
struct SvHash {
  using is_transparent = void;
  size_t operator()(std::string_view sv) const noexcept {
    return std::hash<std::string_view>{}(sv);
  }
  size_t operator()(const std::string& s) const noexcept {
    return std::hash<std::string_view>{}(s);
  }
};
using Table =
    std::unordered_map<std::string, int, SvHash, std::equal_to<>>;

struct Vocab {
  Table head;  // pieces valid at word start
  Table cont;  // continuation pieces, stored WITHOUT their "##" prefix
  Table punct;  // single-char punctuation fast table (subset of head)
  int unk_id = 1;
  size_t max_token_chars = 100;
  // longest stored piece per table: the greedy matcher's first probe is
  // bounded by these — probing longer substrings can only miss, and for
  // long words the unbounded start made matching O(len^2) in hash probes
  size_t max_head_len = 1;
  size_t max_cont_len = 1;
};

inline bool is_ascii_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\v' ||
         c == '\f';
}

inline bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

inline char to_lower(char c) {
  return (c >= 'A' && c <= 'Z') ? static_cast<char>(c + 32) : c;
}

// Greedy longest-match WordPiece over one lowercased word.
// Appends (id, start, end) triples; returns false -> caller emits UNK.
bool wordpiece(const Vocab& vocab, const std::string& word, int word_start,
               std::vector<int>* ids, std::vector<int>* offsets) {
  if (word.size() > vocab.max_token_chars) return false;
  const std::string_view w(word);
  size_t start = 0;
  std::vector<int> tmp_ids;
  std::vector<int> tmp_offsets;
  while (start < w.size()) {
    const Table& table = (start == 0) ? vocab.head : vocab.cont;
    const size_t max_len =
        (start == 0) ? vocab.max_head_len : vocab.max_cont_len;
    size_t end = std::min(w.size(), start + max_len);
    int found = -1;
    size_t found_end = start;
    while (start < end) {
      auto it = table.find(w.substr(start, end - start));
      if (it != table.end()) {
        found = it->second;
        found_end = end;
        break;
      }
      --end;
    }
    if (found < 0) return false;
    tmp_ids.push_back(found);
    tmp_offsets.push_back(word_start + static_cast<int>(start));
    tmp_offsets.push_back(word_start + static_cast<int>(found_end));
    start = found_end;
  }
  ids->insert(ids->end(), tmp_ids.begin(), tmp_ids.end());
  offsets->insert(offsets->end(), tmp_offsets.begin(), tmp_offsets.end());
  return true;
}

// Full basic-tokenize + WordPiece over one ASCII text, appending ids (and
// offsets when non-null). Shared by the single-text and batch entry points.
void tokenize_text(const Vocab& vocab, const char* text, size_t len,
                   int lowercase, std::vector<int>* ids,
                   std::vector<int>* offsets, std::string* word_scratch) {
  std::string& word = *word_scratch;
  word.clear();
  int word_start = -1;
  auto flush = [&](int end_pos) {
    if (word.empty()) return;
    if (offsets != nullptr) {
      if (!wordpiece(vocab, word, word_start, ids, offsets)) {
        ids->push_back(vocab.unk_id);
        offsets->push_back(word_start);
        offsets->push_back(end_pos);
      }
    } else {
      static thread_local std::vector<int> off_scratch;
      off_scratch.clear();
      if (!wordpiece(vocab, word, word_start, ids, &off_scratch)) {
        ids->push_back(vocab.unk_id);
      }
    }
    word.clear();
    word_start = -1;
  };

  for (size_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (is_ascii_space(c)) {
      flush(static_cast<int>(i));
      continue;
    }
    if (is_ascii_punct(c)) {
      flush(static_cast<int>(i));
      const char pc = lowercase ? to_lower(text[i]) : text[i];
      auto it = vocab.punct.find(std::string_view(&pc, 1));
      ids->push_back(it != vocab.punct.end() ? it->second : vocab.unk_id);
      if (offsets != nullptr) {
        offsets->push_back(static_cast<int>(i));
        offsets->push_back(static_cast<int>(i) + 1);
      }
      continue;
    }
    if (word.empty()) word_start = static_cast<int>(i);
    word.push_back(lowercase ? to_lower(text[i]) : text[i]);
  }
  flush(static_cast<int>(len));
}

}  // namespace

extern "C" {

// vocab_data: newline-joined tokens, id = line index.
void* wp_create(const char* vocab_data, size_t len, int unk_id) {
  auto* vocab = new Vocab();
  vocab->unk_id = unk_id;
  std::string data(vocab_data, len);
  size_t pos = 0;
  int id = 0;
  while (pos <= data.size()) {
    size_t nl = data.find('\n', pos);
    if (nl == std::string::npos) nl = data.size();
    if (nl > pos) {
      std::string tok = data.substr(pos, nl - pos);
      if (tok.size() > 2 && tok[0] == '#' && tok[1] == '#') {
        vocab->max_cont_len = std::max(vocab->max_cont_len, tok.size() - 2);
        vocab->cont.emplace(tok.substr(2), id);
      } else {
        vocab->max_head_len = std::max(vocab->max_head_len, tok.size());
        vocab->head.emplace(tok, id);
        if (tok.size() == 1 &&
            is_ascii_punct(static_cast<unsigned char>(tok[0]))) {
          vocab->punct.emplace(tok, id);
        }
      }
    }
    ++id;
    if (nl >= data.size()) break;
    pos = nl + 1;
  }
  return vocab;
}

void wp_free(void* handle) { delete static_cast<Vocab*>(handle); }

// Tokenize ASCII `text` (len bytes). Writes up to max_out ids and
// 2*max_out offsets (start,end pairs). Returns token count, or -1 if the
// output buffer is too small.
int wp_tokenize(void* handle, const char* text, size_t len, int lowercase,
                int* out_ids, int* out_offsets, int max_out) {
  const Vocab& vocab = *static_cast<Vocab*>(handle);
  std::vector<int> ids;
  std::vector<int> offsets;
  std::string word;
  ids.reserve(len / 4 + 4);
  offsets.reserve(len / 2 + 8);
  tokenize_text(vocab, text, len, lowercase, &ids, &offsets, &word);

  if (static_cast<int>(ids.size()) > max_out) return -1;
  std::memcpy(out_ids, ids.data(), ids.size() * sizeof(int));
  std::memcpy(out_offsets, offsets.data(), offsets.size() * sizeof(int));
  return static_cast<int>(ids.size());
}

// Batch tokenize n_texts ASCII texts packed in one blob. texts[i] spans
// blob[starts[i], ends[i]). Ids land in out_ids[i * cap .. i * cap + c),
// c = out_counts[i] = min(token_count, cap) — the caller's framing layer
// truncates to cap anyway, so capped counts are semantically lossless.
// Work is spread over n_threads std::threads via an atomic work index
// (dynamic balance: doc lengths vary wildly in real corpora). The Python
// binding calls this through ctypes, which releases the GIL for the
// duration — this is where host-side tokenization gets its multicore
// scaling (the per-text entry point is GIL-serialized per call).
void wp_tokenize_batch(void* handle, const char* blob,
                       const long long* starts, const long long* ends,
                       int n_texts, int lowercase, int cap, int* out_ids,
                       int* out_counts, int n_threads) {
  const Vocab& vocab = *static_cast<Vocab*>(handle);
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min(n_threads, std::max(1, n_texts));

  std::atomic<int> next{0};
  auto worker = [&]() {
    std::vector<int> ids;
    std::string word;
    for (;;) {
      const int i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n_texts) return;
      ids.clear();
      const char* text = blob + starts[i];
      const size_t len = static_cast<size_t>(ends[i] - starts[i]);
      tokenize_text(vocab, text, len, lowercase, &ids, nullptr, &word);
      const int c = std::min(static_cast<int>(ids.size()), cap);
      std::memcpy(out_ids + static_cast<size_t>(i) * cap, ids.data(),
                  static_cast<size_t>(c) * sizeof(int));
      out_counts[i] = c;
    }
  };

  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
