// English ITN: spoken-form -> written-form rewriting. See itn.h.
//
// Token-stream FSM: scan words; greedily parse number-word spans (cardinals
// with magnitude composition, ordinals, decimals via "point", negatives),
// then apply postfix rules (percent, currency, ordinal suffixes).
#include "itn.h"

#include <cctype>
#include <cstdlib>
#include <cstring>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

const std::map<std::string, long long> kUnits = {
    {"zero", 0},    {"oh", 0},       {"one", 1},     {"two", 2},
    {"three", 3},   {"four", 4},     {"five", 5},    {"six", 6},
    {"seven", 7},   {"eight", 8},    {"nine", 9},    {"ten", 10},
    {"eleven", 11}, {"twelve", 12},  {"thirteen", 13}, {"fourteen", 14},
    {"fifteen", 15},{"sixteen", 16}, {"seventeen", 17}, {"eighteen", 18},
    {"nineteen", 19}};

const std::map<std::string, long long> kTens = {
    {"twenty", 20}, {"thirty", 30}, {"forty", 40},  {"fifty", 50},
    {"sixty", 60},  {"seventy", 70}, {"eighty", 80}, {"ninety", 90}};

const std::map<std::string, long long> kMagnitudes = {
    {"hundred", 100},
    {"thousand", 1000},
    {"million", 1000000},
    {"billion", 1000000000LL},
    {"trillion", 1000000000000LL}};

const std::map<std::string, long long> kOrdinalUnits = {
    {"first", 1},    {"second", 2},  {"third", 3},    {"fourth", 4},
    {"fifth", 5},    {"sixth", 6},   {"seventh", 7},  {"eighth", 8},
    {"ninth", 9},    {"tenth", 10},  {"eleventh", 11},{"twelfth", 12},
    {"thirteenth", 13}, {"fourteenth", 14}, {"fifteenth", 15},
    {"sixteenth", 16}, {"seventeenth", 17}, {"eighteenth", 18},
    {"nineteenth", 19}, {"twentieth", 20}, {"thirtieth", 30},
    {"fortieth", 40}, {"fiftieth", 50}, {"sixtieth", 60},
    {"seventieth", 70}, {"eightieth", 80}, {"ninetieth", 90},
    {"hundredth", 100}, {"thousandth", 1000}, {"millionth", 1000000}};

const std::map<std::string, std::string> kCurrency = {
    {"dollar", "$"}, {"dollars", "$"}, {"euro", "€"}, {"euros", "€"},
    {"pound", "£"}, {"pounds", "£"}, {"yen", "¥"}, {"cent", "¢"},
    {"cents", "¢"}};

struct Token {
  std::string word;   // lowercased core
  std::string raw;    // original with punctuation
  std::string prefix; // leading punctuation
  std::string suffix; // trailing punctuation
};

std::vector<Token> tokenize(const std::string& text) {
  std::vector<Token> out;
  std::istringstream ss(text);
  std::string raw;
  while (ss >> raw) {
    Token t;
    t.raw = raw;
    size_t b = 0, e = raw.size();
    while (b < e && !std::isalnum(static_cast<unsigned char>(raw[b]))) ++b;
    while (e > b && !std::isalnum(static_cast<unsigned char>(raw[e - 1]))) --e;
    t.prefix = raw.substr(0, b);
    t.suffix = raw.substr(e);
    t.word = raw.substr(b, e - b);
    for (auto& c : t.word) c = std::tolower(static_cast<unsigned char>(c));
    out.push_back(std::move(t));
  }
  return out;
}

std::string ordinal_suffix(long long v) {
  long long m100 = v % 100, m10 = v % 10;
  if (m100 >= 11 && m100 <= 13) return "th";
  if (m10 == 1) return "st";
  if (m10 == 2) return "nd";
  if (m10 == 3) return "rd";
  return "th";
}

// Parse a cardinal number-word span starting at i. Returns length consumed
// (0 if none) and sets value. Handles "twenty three", "one hundred and five",
// "three thousand two hundred".
size_t parse_cardinal(const std::vector<Token>& toks, size_t i, long long* value) {
  long long total = 0, current = 0;
  size_t consumed = 0;
  bool any = false;
  for (size_t j = i; j < toks.size(); ++j) {
    const std::string& w = toks[j].word;
    auto u = kUnits.find(w);
    auto t = kTens.find(w);
    auto m = kMagnitudes.find(w);
    if (u != kUnits.end()) {
      if (any && current % 10 != 0 && u->second < 10 && current != 0) break;
      current += u->second;
      any = true;
    } else if (t != kTens.end()) {
      if (any && current % 100 != 0 && current != 0) break;
      current += t->second;
      any = true;
    } else if (m != kMagnitudes.end() && any) {
      if (m->second == 100) {
        current = (current == 0 ? 1 : current) * 100;
      } else {
        total += (current == 0 ? 1 : current) * m->second;
        current = 0;
      }
    } else if (w == "and" && any && j > i &&
               kMagnitudes.count(toks[j - 1].word)) {
      // "one hundred and five": allow connective after magnitude
      if (j + 1 < toks.size() &&
          (kUnits.count(toks[j + 1].word) || kTens.count(toks[j + 1].word))) {
        continue;  // consume silently (consumed updated when number continues)
      }
      break;
    } else {
      break;
    }
    consumed = j - i + 1;
    // stop when token had trailing sentence punctuation
    if (!toks[j].suffix.empty() && toks[j].suffix != ",") break;
  }
  if (!any) return 0;
  *value = total + current;
  return consumed;
}

size_t parse_digit_string(const std::vector<Token>& toks, size_t i,
                          std::string* digits) {
  // "one two three four" (4+ single digits) -> "1234" (phone-number style)
  size_t j = i;
  std::string acc;
  while (j < toks.size()) {
    auto u = kUnits.find(toks[j].word);
    if (u == kUnits.end() || u->second > 9) break;
    acc += static_cast<char>('0' + u->second);
    ++j;
    if (!toks[j - 1].suffix.empty()) break;
  }
  if (acc.size() >= 4) {
    *digits = acc;
    return j - i;
  }
  return 0;
}

std::string format_number(long long v) { return std::to_string(v); }

}  // namespace

extern "C" char* nemo_normalize(const char* text, const char* lang) {
  if (text == nullptr) return nullptr;
  std::string language = lang ? lang : "en";
  if (language.substr(0, 2) != "en") {
    char* out = static_cast<char*>(std::malloc(std::strlen(text) + 1));
    if (out) std::strcpy(out, text);
    return out;
  }

  std::vector<Token> toks = tokenize(text);
  std::vector<std::string> out;
  out.reserve(toks.size());

  size_t i = 0;
  while (i < toks.size()) {
    const Token& tk = toks[i];

    // ordinal word
    auto ord = kOrdinalUnits.find(tk.word);
    if (ord != kOrdinalUnits.end()) {
      long long base = 0;
      size_t pre = 0;
      if (i > 0) {
        // "twenty fifth" -> 25th : look back at pending tens value
        long long tens;
        if (!out.empty() && kTens.count(toks[i - 1].word) &&
            parse_cardinal(toks, i - 1, &tens) == 1) {
          base = tens;
          pre = 1;
          out.pop_back();
        }
      }
      long long v = base + ord->second;
      out.push_back(tk.prefix + format_number(v) + ordinal_suffix(v) + tk.suffix);
      ++i;
      (void)pre;
      continue;
    }

    // phone-style digit string
    std::string digits;
    size_t dn = parse_digit_string(toks, i, &digits);
    if (dn >= 4) {
      out.push_back(toks[i].prefix + digits + toks[i + dn - 1].suffix);
      i += dn;
      continue;
    }

    // cardinal (with optional decimal "point", percent, currency)
    long long v;
    size_t n = parse_cardinal(toks, i, &v);
    bool negative = false;
    if (n == 0 && (tk.word == "minus" || tk.word == "negative") &&
        i + 1 < toks.size()) {
      size_t n2 = parse_cardinal(toks, i + 1, &v);
      if (n2 > 0) {
        negative = true;
        n = n2 + 1;
      }
    }
    if (n > 0) {
      std::string num = (negative ? "-" : "") + format_number(v);
      size_t j = i + n;
      // decimal part: "point five nine"
      if (j < toks.size() && toks[j].word == "point") {
        std::string frac;
        size_t k = j + 1;
        while (k < toks.size()) {
          auto u = kUnits.find(toks[k].word);
          if (u == kUnits.end() || u->second > 9) break;
          frac += static_cast<char>('0' + u->second);
          ++k;
          if (!toks[k - 1].suffix.empty()) break;
        }
        if (!frac.empty()) {
          num += "." + frac;
          j = k;
        }
      }
      // percent
      if (j < toks.size() && toks[j].word == "percent") {
        out.push_back(toks[i].prefix + num + "%" + toks[j].suffix);
        i = j + 1;
        continue;
      }
      // currency
      if (j < toks.size() && kCurrency.count(toks[j].word)) {
        out.push_back(toks[i].prefix + kCurrency.at(toks[j].word) + num +
                      toks[j].suffix);
        i = j + 1;
        continue;
      }
      out.push_back(toks[i].prefix + num + toks[i + n - 1].suffix);
      i = j;
      continue;
    }

    out.push_back(tk.raw);
    ++i;
  }

  std::string joined;
  for (size_t k = 0; k < out.size(); ++k) {
    if (k) joined += " ";
    joined += out[k];
  }
  char* result = static_cast<char*>(std::malloc(joined.size() + 1));
  if (result) std::memcpy(result, joined.c_str(), joined.size() + 1);
  return result;
}

extern "C" void nemo_normalize_free(char* ptr) { std::free(ptr); }

extern "C" int nemo_normalize_supports(const char* lang) {
  return lang && std::strncmp(lang, "en", 2) == 0 ? 1 : 0;
}
