// Native WordPiece tokenizer kernel.
//
// Greedy longest-match-first subword segmentation (the BERT/DistilBERT
// algorithm used by the reference's BertTextTransform,
// examples/mugen/data/bert_text_transform.py:19) over a vocab loaded once.
// Exposed through ctypes (multimodal_tpu/native/wordpiece.py); the Python
// WordPieceTokenizer stays as the behavioral reference and fallback.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct WordPiece {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t unk_id = 0;
  int max_chars_per_word = 100;
};

}  // namespace

extern "C" {

// vocab_blob: '\n'-separated tokens, id = line index.
void* wp_create(const char* vocab_blob, const char* unk_token,
                int max_chars_per_word) {
  auto* wp = new WordPiece();
  wp->max_chars_per_word = max_chars_per_word;
  std::string blob(vocab_blob);
  size_t start = 0;
  int32_t id = 0;
  while (start <= blob.size()) {
    size_t nl = blob.find('\n', start);
    if (nl == std::string::npos) nl = blob.size();
    std::string tok = blob.substr(start, nl - start);
    if (!tok.empty()) wp->vocab.emplace(tok, id);
    ++id;
    start = nl + 1;
    if (nl == blob.size()) break;
  }
  auto it = wp->vocab.find(unk_token);
  wp->unk_id = it == wp->vocab.end() ? 0 : it->second;
  return wp;
}

void wp_destroy(void* handle) { delete static_cast<WordPiece*>(handle); }

// Greedy longest-match segmentation of ONE word (UTF-8 bytes; continuation
// pieces are looked up with a "##" prefix). Returns the number of ids
// written, or 0 with out[0] = unk_id semantics handled by writing unk.
int wp_encode_word(void* handle, const char* word, int32_t* out, int max_out) {
  auto* wp = static_cast<WordPiece*>(handle);
  std::string w(word);
  if ((int)w.size() > wp->max_chars_per_word) {
    if (max_out < 1) return 0;
    out[0] = wp->unk_id;
    return 1;
  }
  std::vector<int32_t> ids;
  size_t start = 0;
  while (start < w.size()) {
    size_t end = w.size();
    int32_t piece = -1;
    size_t piece_end = start;
    while (start < end) {
      std::string sub = w.substr(start, end - start);
      if (start > 0) sub = "##" + sub;
      auto it = wp->vocab.find(sub);
      if (it != wp->vocab.end()) {
        piece = it->second;
        piece_end = end;
        break;
      }
      --end;
    }
    if (piece < 0) {
      if (max_out < 1) return 0;
      out[0] = wp->unk_id;
      return 1;
    }
    ids.push_back(piece);
    start = piece_end;
  }
  int n = (int)ids.size();
  if (n > max_out) n = max_out;
  std::memcpy(out, ids.data(), n * sizeof(int32_t));
  return n;
}

}  // extern "C"
