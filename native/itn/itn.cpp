// ITN: spoken-form -> written-form rewriting. See itn.h.
//
// Token-stream FSM: scan words; greedily parse number-word spans (cardinals
// with magnitude composition, ordinals, decimals, negatives), then apply
// postfix rules (percent, currency, ordinal suffixes). Languages: en (full),
// de (compound-word decomposition), fr (hyphenated vigesimal forms),
// es (fused veinti-/hundreds forms), pt ("e" connectives), it (fused
// compounds with tens elision), ru (cased magnitudes) — covering the
// reference's 7-language Rust NeMo-grammar set (ITN/TextNormalizer.swift:
// 76-133).
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

const std::map<std::string, int> kMonthsEn = {
    {"january", 1},  {"february", 2}, {"march", 3},    {"april", 4},
    {"may", 5},      {"june", 6},     {"july", 7},     {"august", 8},
    {"september", 9},{"october", 10}, {"november", 11},{"december", 12}};

// fraction denominators (plural forms are unambiguous; singular forms are
// gated to numerator 1 to avoid clobbering ordinals)
const std::map<std::string, long long> kFracDen = {
    {"half", 2},    {"halves", 2},  {"third", 3},   {"thirds", 3},
    {"quarter", 4}, {"quarters", 4},{"fifth", 5},   {"fifths", 5},
    {"sixth", 6},   {"sixths", 6},  {"seventh", 7}, {"sevenths", 7},
    {"eighth", 8},  {"eighths", 8}, {"ninth", 9},   {"ninths", 9},
    {"tenth", 10},  {"tenths", 10}};

struct Token {
  std::string word;   // lowercased core
  std::string raw;    // original with punctuation
  std::string prefix; // leading punctuation
  std::string suffix; // trailing punctuation
};

bool is_wordchar(unsigned char c) {
  // UTF-8 continuation/lead bytes (accented letters) count as word chars
  return std::isalnum(c) || c >= 0x80;
}

std::vector<Token> tokenize(const std::string& text) {
  std::vector<Token> out;
  std::istringstream ss(text);
  std::string raw;
  while (ss >> raw) {
    Token t;
    t.raw = raw;
    size_t b = 0, e = raw.size();
    while (b < e && !is_wordchar(static_cast<unsigned char>(raw[b]))) ++b;
    while (e > b && !is_wordchar(static_cast<unsigned char>(raw[e - 1]))) --e;
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
      // teens may only follow a multiple of 100 ("one hundred fifteen"),
      // never another small number ("seven fifteen" is a time, not 22)
      if (any && u->second >= 10 && current % 100 != 0) break;
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

std::string two_digits(long long v) {
  std::string s = std::to_string(v);
  return s.size() < 2 ? "0" + s : s;
}

// Spoken year: "twenty twenty five" / "nineteen ninety nine" (two 2-digit
// cardinal groups) or a plain 4-digit cardinal ("two thousand twenty one").
size_t parse_year_en(const std::vector<Token>& toks, size_t i, long long* year) {
  long long g1;
  size_t n1 = parse_cardinal(toks, i, &g1);
  if (n1 == 0) return 0;
  if (g1 >= 1000 && g1 <= 2999) { *year = g1; return n1; }
  if (g1 >= 13 && g1 <= 99 && toks[i + n1 - 1].suffix.empty()) {
    long long g2;
    size_t n2 = parse_cardinal(toks, i + n1, &g2);
    if (n2 > 0 && g2 >= 0 && g2 <= 99) {
      *year = g1 * 100 + g2;
      return n1 + n2;
    }
  }
  return 0;
}

// Spoken day of month: ordinal word ("third"), tens+ordinal ("twenty
// fifth"), or a small cardinal (1..31).
size_t parse_day_en(const std::vector<Token>& toks, size_t i, long long* day) {
  if (i >= toks.size()) return 0;
  auto t = kTens.find(toks[i].word);
  if (t != kTens.end() && i + 1 < toks.size()) {
    auto o = kOrdinalUnits.find(toks[i + 1].word);
    if (o != kOrdinalUnits.end() && o->second < 10 && toks[i].suffix.empty()) {
      *day = t->second + o->second;
      return 2;
    }
  }
  auto o = kOrdinalUnits.find(toks[i].word);
  if (o != kOrdinalUnits.end() && o->second <= 31) {
    *day = o->second;
    return 1;
  }
  long long v;
  size_t n = parse_cardinal(toks, i, &v);
  if (n > 0 && v >= 1 && v <= 31) {
    *day = v;
    return n;
  }
  return 0;
}

// ----------------------------------------------------------------- German
// German cardinals are single compound words ("dreihundertvierundzwanzig");
// parse one token by recursive decomposition: [x]tausend[y], [x]hundert[y],
// [unit]und[tens], plain unit/tens lookup.

const std::map<std::string, long long> kDeUnits = {
    {"null", 0}, {"ein", 1}, {"eins", 1}, {"eine", 1}, {"zwei", 2},
    {"drei", 3}, {"vier", 4}, {"fünf", 5}, {"fuenf", 5}, {"sechs", 6},
    {"sieben", 7}, {"acht", 8}, {"neun", 9}, {"zehn", 10}, {"elf", 11},
    {"zwölf", 12}, {"zwoelf", 12}, {"dreizehn", 13}, {"vierzehn", 14},
    {"fünfzehn", 15}, {"fuenfzehn", 15}, {"sechzehn", 16}, {"siebzehn", 17},
    {"achtzehn", 18}, {"neunzehn", 19}};

const std::map<std::string, long long> kDeTens = {
    {"zwanzig", 20}, {"dreißig", 30}, {"dreissig", 30}, {"vierzig", 40},
    {"fünfzig", 50}, {"fuenfzig", 50}, {"sechzig", 60}, {"siebzig", 70},
    {"achtzig", 80}, {"neunzig", 90}};

bool parse_de_under_hundred(const std::string& s, long long* out) {
  auto u = kDeUnits.find(s);
  if (u != kDeUnits.end()) { *out = u->second; return true; }
  auto t = kDeTens.find(s);
  if (t != kDeTens.end()) { *out = t->second; return true; }
  size_t und = s.find("und");
  if (und != std::string::npos && und > 0) {
    auto uu = kDeUnits.find(s.substr(0, und));
    auto tt = kDeTens.find(s.substr(und + 3));
    if (uu != kDeUnits.end() && uu->second < 10 && tt != kDeTens.end()) {
      *out = tt->second + uu->second;
      return true;
    }
  }
  return false;
}

bool parse_de_under_thousand(const std::string& s, long long* out) {
  if (s.empty()) { *out = 0; return true; }
  size_t h = s.find("hundert");
  if (h != std::string::npos) {
    long long pre = 1, rest = 0;
    if (h > 0 && !parse_de_under_hundred(s.substr(0, h), &pre)) return false;
    std::string tail = s.substr(h + 7);
    if (!tail.empty() && !parse_de_under_hundred(tail, &rest)) return false;
    *out = pre * 100 + rest;
    return true;
  }
  return parse_de_under_hundred(s, out);
}

bool parse_german_token(const std::string& s, long long* out) {
  size_t t = s.find("tausend");
  if (t != std::string::npos) {
    long long pre = 1, rest = 0;
    if (t > 0 && !parse_de_under_thousand(s.substr(0, t), &pre)) return false;
    std::string tail = s.substr(t + 7);
    if (!tail.empty() && !parse_de_under_thousand(tail, &rest)) return false;
    *out = pre * 1000 + rest;
    return true;
  }
  return parse_de_under_thousand(s, out);
}

size_t parse_cardinal_de(const std::vector<Token>& toks, size_t i, long long* value) {
  if (i >= toks.size()) return 0;
  long long v;
  if (!parse_german_token(toks[i].word, &v)) return 0;
  size_t n = 1;
  // separate magnitude words: "drei millionen", "zwei milliarden"
  while (i + n < toks.size() && toks[i + n - 1].suffix.empty()) {
    const std::string& w = toks[i + n].word;
    long long mag = 0;
    if (w == "million" || w == "millionen") mag = 1000000;
    else if (w == "milliarde" || w == "milliarden") mag = 1000000000LL;
    if (mag == 0) break;
    v *= mag;
    ++n;
    // "zwei millionen fünfhundert..." continuation
    if (i + n < toks.size()) {
      long long rest;
      if (parse_german_token(toks[i + n].word, &rest)) {
        v += rest;
        ++n;
      }
    }
    break;
  }
  *value = v;
  return n;
}

// ----------------------------------------------------------------- French
// "vingt-trois" splits on hyphens during tokenization of subwords; handles
// soixante-dix (70), quatre-vingts (80), quatre-vingt-dix (90), "et".

const std::map<std::string, long long> kFrUnits = {
    {"zéro", 0}, {"zero", 0}, {"un", 1}, {"une", 1}, {"deux", 2},
    {"trois", 3}, {"quatre", 4}, {"cinq", 5}, {"six", 6}, {"sept", 7},
    {"huit", 8}, {"neuf", 9}, {"dix", 10}, {"onze", 11}, {"douze", 12},
    {"treize", 13}, {"quatorze", 14}, {"quinze", 15}, {"seize", 16}};

const std::map<std::string, long long> kFrTens = {
    {"vingt", 20}, {"vingts", 20}, {"trente", 30}, {"quarante", 40},
    {"cinquante", 50}, {"soixante", 60}};

size_t parse_cardinal_fr(const std::vector<Token>& toks, size_t i, long long* value) {
  long long total = 0, current = 0;
  size_t consumed = 0;
  bool any = false;
  for (size_t j = i; j < toks.size(); ++j) {
    // split hyphenated compounds into subwords
    std::vector<std::string> subs;
    std::string w = toks[j].word;
    size_t p = 0;
    while (true) {
      size_t h = toks[j].raw.find('-', p);
      (void)h;
      break;
    }
    {
      std::string acc;
      for (char c : toks[j].raw) {
        char lc = std::tolower(static_cast<unsigned char>(c));
        if (lc == '-') { if (!acc.empty()) subs.push_back(acc); acc.clear(); }
        else if (std::isalnum(static_cast<unsigned char>(c)) || static_cast<unsigned char>(c) >= 0x80)
          acc += lc;
      }
      if (!acc.empty()) subs.push_back(acc);
    }
    bool tok_ok = !subs.empty();
    long long save_current = current, save_total = total;
    bool contributed = false;  // a bare "et" must not be consumed unless a
    for (const std::string& s : subs) {   // number token follows it
      if (s == "et") continue;
      contributed = true;
      auto u = kFrUnits.find(s);
      auto t = kFrTens.find(s);
      if (t != kFrTens.end()) {
        if (current == 4) current = 60 + t->second;  // quatre-vingt(s) = 80
        else current += t->second;
      } else if (u != kFrUnits.end()) {
        if ((current == 60 || current == 80) && u->second >= 10) {
          current += u->second;  // soixante-dix, quatre-vingt-dix..dix-neuf
        } else if (current >= 20 && u->second < 10) {
          current += u->second;  // vingt-trois
        } else if (current == 0 && !any && s == "dix" && subs.size() > 1) {
          current = 10;  // dix-sept / dix-huit / dix-neuf
        } else if (current == 10 && u->second >= 7 && u->second <= 9) {
          current += u->second;
        } else if (current == 0) {
          current = u->second;
        } else { tok_ok = false; break; }
      } else if (s == "cent" || s == "cents") {
        current = (current == 0 ? 1 : current) * 100;
      } else if (s == "mille") {
        total += (current == 0 ? 1 : current) * 1000;
        current = 0;
      } else if (s == "million" || s == "millions") {
        total += (current == 0 ? 1 : current) * 1000000;
        current = 0;
      } else { tok_ok = false; break; }
    }
    if (!tok_ok) { current = save_current; total = save_total; break; }
    if (contributed) {
      any = true;
      consumed = j - i + 1;  // "et" alone stays unconsumed ("soixante et
    }                        // quelques" keeps the word; "et onze" folds in)
    if (!toks[j].suffix.empty() && toks[j].suffix != ",") break;
  }
  if (!any) return 0;
  *value = total + current;
  return consumed;
}

// ---------------------------------------------------------------- Spanish

const std::map<std::string, long long> kEsWords = {
    {"cero", 0}, {"uno", 1}, {"una", 1}, {"un", 1}, {"dos", 2}, {"tres", 3},
    {"cuatro", 4}, {"cinco", 5}, {"seis", 6}, {"siete", 7}, {"ocho", 8},
    {"nueve", 9}, {"diez", 10}, {"once", 11}, {"doce", 12}, {"trece", 13},
    {"catorce", 14}, {"quince", 15}, {"dieciséis", 16}, {"dieciseis", 16},
    {"diecisiete", 17}, {"dieciocho", 18}, {"diecinueve", 19},
    {"veinte", 20}, {"veintiuno", 21}, {"veintiún", 21}, {"veintidós", 22},
    {"veintidos", 22}, {"veintitrés", 23}, {"veintitres", 23},
    {"veinticuatro", 24}, {"veinticinco", 25}, {"veintiséis", 26},
    {"veintiseis", 26}, {"veintisiete", 27}, {"veintiocho", 28},
    {"veintinueve", 29}, {"treinta", 30}, {"cuarenta", 40},
    {"cincuenta", 50}, {"sesenta", 60}, {"setenta", 70}, {"ochenta", 80},
    {"noventa", 90}, {"cien", 100}, {"ciento", 100}, {"doscientos", 200},
    {"trescientos", 300}, {"cuatrocientos", 400}, {"quinientos", 500},
    {"seiscientos", 600}, {"setecientos", 700}, {"ochocientos", 800},
    {"novecientos", 900}};

size_t parse_cardinal_es(const std::vector<Token>& toks, size_t i, long long* value) {
  long long total = 0, current = 0;
  size_t consumed = 0;
  bool any = false;
  for (size_t j = i; j < toks.size(); ++j) {
    const std::string& w = toks[j].word;
    auto it = kEsWords.find(w);
    if (it != kEsWords.end()) {
      long long v = it->second;
      if (v >= 100) {
        if (current >= 100) break;  // two hundreds in a row: stop
        current += v;               // "ciento veinte" handled below
      } else if (current % 100 == 0) {
        current += v;
      } else if (current % 10 == 0 && v < 10) {
        current += v;  // "treinta y dos" (the "y" consumed below)
      } else {
        break;
      }
      any = true;
    } else if (w == "y" && any && j + 1 < toks.size() &&
               kEsWords.count(toks[j + 1].word)) {
      continue;
    } else if ((w == "mil") && (any || true)) {
      total += (current == 0 ? 1 : current) * 1000;
      current = 0;
      any = true;
    } else if ((w == "millón" || w == "millon" || w == "millones") && any) {
      total += (current == 0 ? 1 : current) * 1000000;
      current = 0;
    } else {
      break;
    }
    consumed = j - i + 1;
    if (!toks[j].suffix.empty() && toks[j].suffix != ",") break;
  }
  if (!any) return 0;
  *value = total + current;
  return consumed;
}

// -------------------------------------------------------------- Portuguese
// Separate words with "e" connectives: "vinte e três", "cento e vinte".

const std::map<std::string, long long> kPtWords = {
    {"zero", 0}, {"um", 1}, {"uma", 1}, {"dois", 2}, {"duas", 2},
    {"três", 3}, {"tres", 3}, {"quatro", 4}, {"cinco", 5}, {"seis", 6},
    {"sete", 7}, {"oito", 8}, {"nove", 9}, {"dez", 10}, {"onze", 11},
    {"doze", 12}, {"treze", 13}, {"catorze", 14}, {"quatorze", 14},
    {"quinze", 15}, {"dezesseis", 16}, {"dezasseis", 16}, {"dezessete", 17},
    {"dezassete", 17}, {"dezoito", 18}, {"dezenove", 19}, {"dezanove", 19},
    {"vinte", 20}, {"trinta", 30}, {"quarenta", 40}, {"cinquenta", 50},
    {"sessenta", 60}, {"setenta", 70}, {"oitenta", 80}, {"noventa", 90},
    {"cem", 100}, {"cento", 100}, {"duzentos", 200}, {"trezentos", 300},
    {"quatrocentos", 400}, {"quinhentos", 500}, {"seiscentos", 600},
    {"setecentos", 700}, {"oitocentos", 800}, {"novecentos", 900}};

size_t parse_cardinal_pt(const std::vector<Token>& toks, size_t i, long long* value) {
  long long total = 0, current = 0;
  size_t consumed = 0;
  bool any = false;
  for (size_t j = i; j < toks.size(); ++j) {
    const std::string& w = toks[j].word;
    auto it = kPtWords.find(w);
    if (it != kPtWords.end()) {
      long long v = it->second;
      if (v >= 100) {
        if (current >= 100) break;
        current += v;
      } else if (current % 100 == 0) {
        current += v;
      } else if (current % 10 == 0 && v < 10) {
        current += v;
      } else {
        break;
      }
      any = true;
    } else if (w == "e" && any && j + 1 < toks.size() &&
               (kPtWords.count(toks[j + 1].word) || toks[j + 1].word == "mil")) {
      continue;
    } else if (w == "mil") {
      total += (current == 0 ? 1 : current) * 1000;
      current = 0;
      any = true;
    } else if ((w == "milhão" || w == "milhao" || w == "milhões" ||
                w == "milhoes") && any) {
      total += (current == 0 ? 1 : current) * 1000000;
      current = 0;
    } else {
      break;
    }
    consumed = j - i + 1;
    if (!toks[j].suffix.empty() && toks[j].suffix != ",") break;
  }
  if (!any) return 0;
  *value = total + current;
  return consumed;
}

// ----------------------------------------------------------------- Italian
// Fused compounds like German: "duecentotrentaquattro"; tens elide their
// final vowel before uno/otto ("ventuno", "trentotto").

const std::map<std::string, long long> kItUnits = {
    {"zero", 0}, {"uno", 1}, {"un", 1}, {"una", 1}, {"due", 2}, {"tre", 3},
    {"tré", 3}, {"quattro", 4}, {"cinque", 5}, {"sei", 6}, {"sette", 7},
    {"otto", 8}, {"nove", 9}, {"dieci", 10}, {"undici", 11}, {"dodici", 12},
    {"tredici", 13}, {"quattordici", 14}, {"quindici", 15}, {"sedici", 16},
    {"diciassette", 17}, {"diciotto", 18}, {"diciannove", 19}};

// full form and elided form (before vowel-initial uno/otto)
const std::vector<std::pair<std::string, long long>> kItTens = {
    {"venti", 20}, {"vent", 20}, {"trenta", 30}, {"trent", 30},
    {"quaranta", 40}, {"quarant", 40}, {"cinquanta", 50}, {"cinquant", 50},
    {"sessanta", 60}, {"sessant", 60}, {"settanta", 70}, {"settant", 70},
    {"ottanta", 80}, {"ottant", 80}, {"novanta", 90}, {"novant", 90}};

bool parse_it_under_hundred(const std::string& s, long long* out) {
  auto u = kItUnits.find(s);
  if (u != kItUnits.end()) { *out = u->second; return true; }
  for (const auto& [pre, tv] : kItTens) {
    if (s == pre && pre.back() != 't') { *out = tv; return true; }
    if (s.size() > pre.size() && s.compare(0, pre.size(), pre) == 0) {
      auto uu = kItUnits.find(s.substr(pre.size()));
      if (uu != kItUnits.end() && uu->second >= 1 && uu->second <= 9) {
        *out = tv + uu->second;
        return true;
      }
    }
  }
  return false;
}

bool parse_it_under_thousand(const std::string& s, long long* out) {
  if (s.empty()) { *out = 0; return true; }
  size_t c = s.find("cento");
  if (c != std::string::npos) {
    long long pre = 1, rest = 0;
    if (c > 0) {
      auto uu = kItUnits.find(s.substr(0, c));
      if (uu == kItUnits.end() || uu->second < 1 || uu->second > 9) return false;
      pre = uu->second;
    }
    std::string tail = s.substr(c + 5);
    if (!tail.empty() && !parse_it_under_hundred(tail, &rest)) return false;
    *out = pre * 100 + rest;
    return true;
  }
  return parse_it_under_hundred(s, out);
}

bool parse_italian_token(const std::string& s, long long* out) {
  if (s == "mille") { *out = 1000; return true; }
  size_t m = s.find("mila");
  if (m != std::string::npos && m > 0) {
    long long pre = 0, rest = 0;
    if (!parse_it_under_thousand(s.substr(0, m), &pre)) return false;
    std::string tail = s.substr(m + 4);
    if (!tail.empty() && !parse_it_under_thousand(tail, &rest)) return false;
    *out = pre * 1000 + rest;
    return true;
  }
  if (s.compare(0, 5, "mille") == 0 && s.size() > 5) {
    long long rest;
    if (!parse_it_under_thousand(s.substr(5), &rest)) return false;
    *out = 1000 + rest;
    return true;
  }
  return parse_it_under_thousand(s, out);
}

size_t parse_cardinal_it(const std::vector<Token>& toks, size_t i, long long* value) {
  if (i >= toks.size()) return 0;
  long long v;
  if (!parse_italian_token(toks[i].word, &v)) return 0;
  size_t n = 1;
  if (i + n < toks.size() && toks[i + n - 1].suffix.empty()) {
    const std::string& w = toks[i + n].word;
    long long mag = 0;
    if (w == "milione" || w == "milioni") mag = 1000000;
    else if (w == "miliardo" || w == "miliardi") mag = 1000000000LL;
    if (mag != 0) {
      v *= mag;
      ++n;
      if (i + n < toks.size()) {
        long long rest;
        if (parse_italian_token(toks[i + n].word, &rest)) {
          v += rest;
          ++n;
        }
      }
    }
  }
  *value = v;
  return n;
}

// ----------------------------------------------------------------- Russian
// Separate words, gendered unit forms, plural-cased magnitudes.

const std::map<std::string, long long> kRuWords = {
    {"ноль", 0}, {"один", 1}, {"одна", 1}, {"одно", 1}, {"два", 2},
    {"две", 2}, {"три", 3}, {"четыре", 4}, {"пять", 5}, {"шесть", 6},
    {"семь", 7}, {"восемь", 8}, {"девять", 9}, {"десять", 10},
    {"одиннадцать", 11}, {"двенадцать", 12}, {"тринадцать", 13},
    {"четырнадцать", 14}, {"пятнадцать", 15}, {"шестнадцать", 16},
    {"семнадцать", 17}, {"восемнадцать", 18}, {"девятнадцать", 19},
    {"двадцать", 20}, {"тридцать", 30}, {"сорок", 40}, {"пятьдесят", 50},
    {"шестьдесят", 60}, {"семьдесят", 70}, {"восемьдесят", 80},
    {"девяносто", 90}, {"сто", 100}, {"двести", 200}, {"триста", 300},
    {"четыреста", 400}, {"пятьсот", 500}, {"шестьсот", 600},
    {"семьсот", 700}, {"восемьсот", 800}, {"девятьсот", 900}};

bool ru_is_thousand(const std::string& w) {
  return w == "тысяча" || w == "тысячи" || w == "тысяч";
}

bool ru_is_million(const std::string& w) {
  return w == "миллион" || w == "миллиона" || w == "миллионов";
}

size_t parse_cardinal_ru(const std::vector<Token>& toks, size_t i, long long* value) {
  long long total = 0, current = 0;
  size_t consumed = 0;
  bool any = false;
  for (size_t j = i; j < toks.size(); ++j) {
    const std::string& w = toks[j].word;
    auto it = kRuWords.find(w);
    if (it != kRuWords.end()) {
      long long v = it->second;
      if (v >= 100) {
        if (current >= 100) break;
        current += v;
      } else if (current % 100 == 0 || (current % 10 == 0 && v < 10)) {
        current += v;
      } else {
        break;
      }
      any = true;
    } else if (ru_is_thousand(w)) {
      total += (current == 0 ? 1 : current) * 1000;
      current = 0;
      any = true;
    } else if (ru_is_million(w) && any) {
      total += (current == 0 ? 1 : current) * 1000000;
      current = 0;
    } else {
      break;
    }
    consumed = j - i + 1;
    if (!toks[j].suffix.empty() && toks[j].suffix != ",") break;
  }
  if (!any) return 0;
  *value = total + current;
  return consumed;
}

// --------------------------------------------------- generic non-en driver

struct LangGrammar {
  size_t (*parse)(const std::vector<Token>&, size_t, long long*);
  std::map<std::string, std::string> currency;
  std::vector<std::string> percent;  // token sequence, e.g. {"por", "ciento"}
  std::string decimal_word;          // "komma" / "virgule" / "coma"
  std::vector<std::string> negative;
  std::vector<std::string> percent_alts = {};  // alternate single-word forms
  // dates: spoken month names (lowercase; ru uses genitive forms)
  std::map<std::string, int> months = {};
  std::map<std::string, int> day_ordinals = {};  // spoken ordinal day forms
  std::string day_month_sep = "";    // es/pt "de" between day and month
  std::string date_day_suffix = "";  // de: "3." ordinal-dot day
  // money composition: "<N> <currency> [conn] <M> <cent-word>" -> SYM N.MM
  std::map<std::string, int> cent_words = {};
  std::vector<std::string> cent_connectives = {};
  // time: "<H> <time_word> [M]" -> "H:MM <time_word>" or "H h MM" (fr)
  std::vector<std::string> time_words = {};
  bool time_h_style = false;  // fr: "3 h 30"
};

std::string two_digits_g(long long v) {
  std::string s = std::to_string(v);
  return s.size() < 2 ? "0" + s : s;
}

// date tail: at position j (after a parsed day value), match
// [sep] <month> [year]; returns consumed length and appends to text_out.
size_t match_date_tail(const std::vector<Token>& toks, size_t j,
                       const LangGrammar& g, long long day,
                       std::string* text_out) {
  size_t start = j;
  if (!g.day_month_sep.empty() && j < toks.size() &&
      toks[j].word == g.day_month_sep)
    ++j;
  if (j >= toks.size() || !g.months.count(toks[j].word)) return 0;
  std::string s = std::to_string(day) + g.date_day_suffix;
  if (!g.day_month_sep.empty()) s += " " + g.day_month_sep;
  s += " " + toks[j].word;
  size_t consumed = j + 1 - start;
  if (toks[j].suffix.empty()) {
    long long year;
    size_t yn = g.parse(toks, j + 1, &year);
    if (yn > 0 && year >= 1000 && year <= 2999) {
      // es/pt year connective: "de dos mil veinte"
      s += " " + std::to_string(year);
      consumed += yn;
    } else if (!g.day_month_sep.empty() && j + 1 < toks.size() &&
               toks[j + 1].word == g.day_month_sep) {
      size_t yn2 = g.parse(toks, j + 2, &year);
      if (yn2 > 0 && year >= 1000 && year <= 2999) {
        s += " " + g.day_month_sep + " " + std::to_string(year);
        consumed += 1 + yn2;
      }
    }
  }
  *text_out = s;
  return consumed;
}

std::string normalize_generic(const std::vector<Token>& toks, const LangGrammar& g) {
  std::vector<std::string> out;
  out.reserve(toks.size());
  size_t i = 0;
  while (i < toks.size()) {
    // spoken ordinal day + month ("dritter oktober" / "третьего марта")
    if (!g.day_ordinals.empty() && g.day_ordinals.count(toks[i].word) &&
        toks[i].suffix.empty()) {
      std::string text_out;
      size_t dn = match_date_tail(toks, i + 1, g,
                                  g.day_ordinals.at(toks[i].word), &text_out);
      if (dn > 0) {
        out.push_back(toks[i].prefix + text_out + toks[i + dn].suffix);
        i += 1 + dn;
        continue;
      }
    }

    long long v;
    size_t n = g.parse(toks, i, &v);
    bool negative = false;
    if (n == 0 && i + 1 < toks.size()) {
      for (const auto& neg : g.negative) {
        if (toks[i].word == neg) {
          size_t n2 = g.parse(toks, i + 1, &v);
          if (n2 > 0) { negative = true; n = n2 + 1; }
          break;
        }
      }
    }
    if (n > 0) {
      std::string num = (negative ? "-" : "") + format_number(v);
      size_t j = i + n;

      // cardinal-day date: "<1..31> [de] <month> [year]"
      if (!negative && v >= 1 && v <= 31 && !g.months.empty() &&
          toks[j - 1].suffix.empty()) {
        std::string text_out;
        size_t dn = match_date_tail(toks, j, g, v, &text_out);
        if (dn > 0) {
          out.push_back(toks[i].prefix + text_out + toks[j + dn - 1].suffix);
          i = j + dn;
          continue;
        }
      }

      // time: "<H> uhr [M]" -> "3:30 uhr"; fr "<H> heures [M]" -> "3 h 30"
      if (!negative && v >= 0 && v <= 24 && !g.time_words.empty() &&
          j < toks.size()) {
        bool tw = false;
        for (const auto& w : g.time_words)
          if (toks[j].word == w) { tw = true; break; }
        if (tw) {
          long long mins = -1;
          size_t mn = 0;
          if (toks[j].suffix.empty()) {
            mn = g.parse(toks, j + 1, &mins);
            if (mn > 0 && (mins < 0 || mins > 59)) mn = 0;
          }
          std::string s;
          if (g.time_h_style)
            s = num + " h" + (mn > 0 ? " " + two_digits_g(mins) : "");
          else
            s = num + (mn > 0 ? ":" + two_digits_g(mins) : "") + " " +
                toks[j].word;
          size_t e = j + 1 + (mn > 0 ? mn : 0);
          out.push_back(toks[i].prefix + s + toks[e - 1].suffix);
          i = e;
          continue;
        }
      }

      size_t last_consumed = i + n - 1;  // token carrying the final suffix
      if (j < toks.size() && toks[j].word == g.decimal_word) {
        std::string frac;
        size_t k = j + 1;
        while (k < toks.size()) {
          long long d;
          // parse each digit word on a ONE-token slice: a greedy
          // multi-token parse would merge "cero cinco" into 5 and lose
          // the leading zero of "tres coma cero cinco" (3.05)
          std::vector<Token> one(1, toks[k]);
          if (g.parse(one, 0, &d) != 1 || d > 9) break;
          frac += static_cast<char>('0' + d);
          ++k;
          if (!toks[k - 1].suffix.empty()) break;
        }
        if (!frac.empty()) {
          num += "." + frac;
          j = k;
          last_consumed = k - 1;  // keep the last digit's punctuation
        }
      }
      if (!g.percent.empty() && j + g.percent.size() <= toks.size()) {
        bool match = true;
        for (size_t k = 0; k < g.percent.size(); ++k)
          if (toks[j + k].word != g.percent[k]) { match = false; break; }
        if (match) {
          out.push_back(toks[i].prefix + num + "%" +
                        toks[j + g.percent.size() - 1].suffix);
          i = j + g.percent.size();
          continue;
        }
      }
      bool alt_pct = false;
      for (const auto& alt : g.percent_alts) {
        if (j < toks.size() && toks[j].word == alt) { alt_pct = true; break; }
      }
      if (alt_pct) {
        out.push_back(toks[i].prefix + num + "%" + toks[j].suffix);
        i = j + 1;
        continue;
      }
      if (j < toks.size() && g.currency.count(toks[j].word)) {
        const std::string& sym = g.currency.at(toks[j].word);
        // cents composition: "<N> euro [und] <M> cent" -> "€N.MM"
        if (!g.cent_words.empty() && toks[j].suffix.empty()) {
          size_t k = j + 1;
          for (const auto& conn : g.cent_connectives) {
            if (k < toks.size() && toks[k].word == conn) { ++k; break; }
          }
          long long cents;
          size_t cn = g.parse(toks, k, &cents);
          size_t cw = k + cn;
          if (cn > 0 && cents >= 0 && cents <= 99 && cw < toks.size() &&
              g.cent_words.count(toks[cw].word)) {
            out.push_back(toks[i].prefix + sym + num + "." +
                          two_digits_g(cents) + toks[cw].suffix);
            i = cw + 1;
            continue;
          }
        }
        out.push_back(toks[i].prefix + sym + num + toks[j].suffix);
        i = j + 1;
        continue;
      }
      out.push_back(toks[i].prefix + num + toks[last_consumed].suffix);
      i = j;
      continue;
    }
    out.push_back(toks[i].raw);
    ++i;
  }
  std::string joined;
  for (size_t k = 0; k < out.size(); ++k) {
    if (k) joined += " ";
    joined += out[k];
  }
  return joined;
}

const std::map<std::string, int> kMonthsDe = {
    {"januar", 1}, {"februar", 2}, {"märz", 3}, {"april", 4}, {"mai", 5},
    {"juni", 6}, {"juli", 7}, {"august", 8}, {"september", 9},
    {"oktober", 10}, {"november", 11}, {"dezember", 12}};
const std::map<std::string, int> kMonthsFr = {
    {"janvier", 1}, {"février", 2}, {"mars", 3}, {"avril", 4}, {"mai", 5},
    {"juin", 6}, {"juillet", 7}, {"août", 8}, {"septembre", 9},
    {"octobre", 10}, {"novembre", 11}, {"décembre", 12}};
const std::map<std::string, int> kMonthsEs = {
    {"enero", 1}, {"febrero", 2}, {"marzo", 3}, {"abril", 4}, {"mayo", 5},
    {"junio", 6}, {"julio", 7}, {"agosto", 8}, {"septiembre", 9},
    {"octubre", 10}, {"noviembre", 11}, {"diciembre", 12}};
const std::map<std::string, int> kMonthsPt = {
    {"janeiro", 1}, {"fevereiro", 2}, {"março", 3}, {"abril", 4}, {"maio", 5},
    {"junho", 6}, {"julho", 7}, {"agosto", 8}, {"setembro", 9},
    {"outubro", 10}, {"novembro", 11}, {"dezembro", 12}};
const std::map<std::string, int> kMonthsIt = {
    {"gennaio", 1}, {"febbraio", 2}, {"marzo", 3}, {"aprile", 4},
    {"maggio", 5}, {"giugno", 6}, {"luglio", 7}, {"agosto", 8},
    {"settembre", 9}, {"ottobre", 10}, {"novembre", 11}, {"dicembre", 12}};
const std::map<std::string, int> kMonthsRu = {  // genitive (date) forms
    {"января", 1}, {"февраля", 2}, {"марта", 3}, {"апреля", 4}, {"мая", 5},
    {"июня", 6}, {"июля", 7}, {"августа", 8}, {"сентября", 9},
    {"октября", 10}, {"ноября", 11}, {"декабря", 12}};

const std::map<std::string, int> kDayOrdDe = {
    {"erster", 1}, {"ersten", 1}, {"zweiter", 2}, {"zweiten", 2},
    {"dritter", 3}, {"dritten", 3}, {"vierter", 4}, {"vierten", 4},
    {"fünfter", 5}, {"fünften", 5}, {"sechster", 6}, {"sechsten", 6},
    {"siebter", 7}, {"siebten", 7}, {"achter", 8}, {"achten", 8},
    {"neunter", 9}, {"neunten", 9}, {"zehnter", 10}, {"zehnten", 10},
    {"elfter", 11}, {"elften", 11}, {"zwölfter", 12}, {"zwölften", 12},
    {"zwanzigster", 20}, {"zwanzigsten", 20},
    {"dreißigster", 30}, {"dreißigsten", 30},
    {"einunddreißigster", 31}, {"einunddreißigsten", 31}};
const std::map<std::string, int> kDayOrdRu = {
    {"первое", 1}, {"первого", 1}, {"второе", 2}, {"второго", 2},
    {"третье", 3}, {"третьего", 3}, {"четвёртое", 4}, {"четвёртого", 4},
    {"четвертое", 4}, {"четвертого", 4}, {"пятое", 5}, {"пятого", 5},
    {"шестое", 6}, {"шестого", 6}, {"седьмое", 7}, {"седьмого", 7},
    {"восьмое", 8}, {"восьмого", 8}, {"девятое", 9}, {"девятого", 9},
    {"десятое", 10}, {"десятого", 10}, {"двадцатое", 20}, {"двадцатого", 20},
    {"тридцатое", 30}, {"тридцатого", 30}};

const LangGrammar kGerman = {
    parse_cardinal_de,
    {{"euro", "€"}, {"euros", "€"}, {"dollar", "$"}, {"dollars", "$"}},
    {"prozent"},
    "komma",
    {"minus"},
    {},
    kMonthsDe,
    kDayOrdDe,
    "",
    ".",  // "3. oktober"
    {{"cent", 1}, {"cents", 1}},
    {"und"},
    {"uhr"}};

const LangGrammar kFrench = {
    parse_cardinal_fr,
    {{"euro", "€"}, {"euros", "€"}, {"dollar", "$"}, {"dollars", "$"}},
    {"pour", "cent"},
    "virgule",
    {"moins"},
    {},
    kMonthsFr,
    {{"premier", 1}},
    "",
    "",
    {{"centime", 1}, {"centimes", 1}},
    {"et"},
    {"heures", "heure"},
    true};  // "3 h 30"

const LangGrammar kPortuguese = {
    parse_cardinal_pt,
    {{"euro", "€"}, {"euros", "€"}, {"dólar", "$"}, {"dólares", "$"},
     {"dolar", "$"}, {"dolares", "$"}, {"real", "R$"}, {"reais", "R$"}},
    {"por", "cento"},
    "vírgula",
    {"menos"},
    {},
    kMonthsPt,
    {{"primeiro", 1}},
    "de",
    "",
    {{"cêntimo", 1}, {"cêntimos", 1}, {"centavo", 1}, {"centavos", 1}},
    {"e", "com"}};

const LangGrammar kItalian = {
    parse_cardinal_it,
    {{"euro", "€"}, {"euri", "€"}, {"dollaro", "$"}, {"dollari", "$"}},
    {"per", "cento"},
    "virgola",
    {"meno"},
    {},
    kMonthsIt,
    {{"primo", 1}},
    "",
    "",
    {{"centesimo", 1}, {"centesimi", 1}},
    {"e"}};

const LangGrammar kRussian = {
    parse_cardinal_ru,
    {{"рубль", "₽"}, {"рубля", "₽"}, {"рублей", "₽"}, {"доллар", "$"},
     {"доллара", "$"}, {"долларов", "$"}, {"евро", "€"}},
    {"процентов"},
    "запятая",
    {"минус"},
    {"процент", "процента"},
    kMonthsRu,
    kDayOrdRu,
    "",
    "",
    {{"копейка", 1}, {"копейки", 1}, {"копеек", 1}},
    {"и"}};

const LangGrammar kSpanish = {
    parse_cardinal_es,
    {{"euro", "€"}, {"euros", "€"}, {"dólar", "$"}, {"dólares", "$"},
     {"dolar", "$"}, {"dolares", "$"}, {"peso", "$"}, {"pesos", "$"}},
    {"por", "ciento"},
    "coma",
    {"menos"},
    {},
    kMonthsEs,
    {{"primero", 1}},
    "de",
    "",
    {{"céntimo", 1}, {"céntimos", 1}, {"centavo", 1}, {"centavos", 1}},
    {"con", "y"}};

}  // namespace

// ---------------------------------------------------------------------------
// Custom spoken->written rules (reference ITN/TextNormalizer.swift:289-330:
// nemo_add_rule / nemo_remove_rule / nemo_clear_rules / nemo_rule_count).
// Highest priority: applied on the token stream before every built-in
// tagger; spoken forms match case-insensitively on whole-word spans and
// longer phrases win over shorter ones.
// ---------------------------------------------------------------------------
namespace {

struct CustomRule {
  std::vector<std::string> spoken;  // lowercased words
  std::string written;
};

std::vector<CustomRule>& custom_rules() {
  static std::vector<CustomRule> rules;
  return rules;
}

std::vector<std::string> split_lower_words(const std::string& s) {
  std::vector<std::string> out;
  std::istringstream ss(s);
  std::string w;
  while (ss >> w) {
    for (auto& c : w) c = std::tolower(static_cast<unsigned char>(c));
    out.push_back(std::move(w));
  }
  return out;
}

// Replace rule matches in the token stream with their written form,
// preserving the boundary tokens' leading/trailing punctuation.
std::vector<Token> apply_custom_rules(std::vector<Token> toks) {
  const auto& rules = custom_rules();
  if (rules.empty()) return toks;
  std::vector<Token> out;
  out.reserve(toks.size());
  size_t i = 0;
  while (i < toks.size()) {
    const CustomRule* best = nullptr;
    for (const auto& r : rules) {
      if (r.spoken.empty() || i + r.spoken.size() > toks.size()) continue;
      bool match = true;
      for (size_t k = 0; k < r.spoken.size(); ++k) {
        if (toks[i + k].word != r.spoken[k] ||
            (k + 1 < r.spoken.size() && !toks[i + k].suffix.empty())) {
          match = false;
          break;
        }
      }
      if (match && (best == nullptr || r.spoken.size() > best->spoken.size()))
        best = &r;
    }
    if (best != nullptr) {
      size_t last = i + best->spoken.size() - 1;
      Token t;
      t.prefix = toks[i].prefix;
      t.suffix = toks[last].suffix;
      t.word = best->written;
      t.raw = t.prefix + t.word + t.suffix;
      out.push_back(std::move(t));
      i = last + 1;
    } else {
      out.push_back(toks[i]);
      ++i;
    }
  }
  return out;
}

}  // namespace

extern "C" void nemo_add_rule(const char* spoken, const char* written) {
  if (spoken == nullptr || written == nullptr) return;
  std::vector<std::string> words = split_lower_words(spoken);
  if (words.empty()) return;
  for (auto& r : custom_rules()) {
    if (r.spoken == words) {  // replace an existing rule for the same form
      r.written = written;
      return;
    }
  }
  custom_rules().push_back(CustomRule{std::move(words), written});
}

extern "C" int nemo_remove_rule(const char* spoken) {
  if (spoken == nullptr) return 0;
  std::vector<std::string> words = split_lower_words(spoken);
  auto& rules = custom_rules();
  for (auto it = rules.begin(); it != rules.end(); ++it) {
    if (it->spoken == words) {
      rules.erase(it);
      return 1;
    }
  }
  return 0;
}

extern "C" void nemo_clear_rules() { custom_rules().clear(); }

extern "C" unsigned nemo_rule_count() {
  return static_cast<unsigned>(custom_rules().size());
}

extern "C" const char* nemo_version() { return "fluidaudio-itn 1.1.0"; }

extern "C" char* nemo_normalize(const char* text, const char* lang) {
  if (text == nullptr) return nullptr;
  std::string language = lang ? lang : "en";
  std::string code = language.substr(0, 2);
  if (code != "en") {
    const LangGrammar* g = nullptr;
    if (code == "de") g = &kGerman;
    else if (code == "fr") g = &kFrench;
    else if (code == "es") g = &kSpanish;
    else if (code == "pt") g = &kPortuguese;
    else if (code == "it") g = &kItalian;
    else if (code == "ru") g = &kRussian;
    if (g == nullptr) {  // unsupported: identity (graceful degradation),
      // except user rules, which apply in every language
      if (!custom_rules().empty()) {
        std::vector<Token> toks = apply_custom_rules(tokenize(text));
        std::string joined;
        for (size_t k = 0; k < toks.size(); ++k) {
          if (k) joined += " ";
          joined += toks[k].raw;
        }
        char* res = static_cast<char*>(std::malloc(joined.size() + 1));
        if (res) std::memcpy(res, joined.c_str(), joined.size() + 1);
        return res;
      }
      char* out = static_cast<char*>(std::malloc(std::strlen(text) + 1));
      if (out) std::strcpy(out, text);
      return out;
    }
    std::string joined = normalize_generic(apply_custom_rules(tokenize(text)), *g);
    char* result = static_cast<char*>(std::malloc(joined.size() + 1));
    if (result) std::memcpy(result, joined.c_str(), joined.size() + 1);
    return result;
  }

  std::vector<Token> toks = apply_custom_rules(tokenize(text));
  std::vector<std::string> out;
  out.reserve(toks.size());

  size_t i = 0;
  while (i < toks.size()) {
    const Token& tk = toks[i];

    // date: "<month> <day> [year]" — "june third twenty twenty five"
    // -> "june 3 2025". A month word with NO adjacent day/year is left
    // alone: this is the ambiguity gate standing in for the reference's
    // NLTagger pass ("may i help" / "march on") —
    // ITN/TextNormalizer.swift NLTagger gate.
    if (kMonthsEn.count(tk.word) && tk.suffix.empty()) {
      long long day;
      size_t dn = parse_day_en(toks, i + 1, &day);
      if (dn > 0) {
        size_t j = i + 1 + dn;
        std::string text_out = tk.prefix + tk.word + " " + format_number(day);
        long long year;
        size_t yn = (toks[j - 1].suffix.empty())
                        ? parse_year_en(toks, j, &year) : 0;
        if (yn > 0) {
          text_out += " " + format_number(year);
          j += yn;
        }
        text_out += toks[j - 1].suffix;
        out.push_back(text_out);
        i = j;
        continue;
      }
      long long year;  // "march twenty twenty" (month + year, no day)
      size_t yn = parse_year_en(toks, i + 1, &year);
      if (yn > 0 && year >= 1900) {
        out.push_back(tk.prefix + tk.word + " " + format_number(year) +
                      toks[i + yn].suffix);
        i += 1 + yn;
        continue;
      }
    }

    // ordinal word
    auto ord = kOrdinalUnits.find(tk.word);
    if (ord != kOrdinalUnits.end()) {
      // ambiguity gate for "second" (time-unit noun vs ordinal): convert
      // only in ordinal-looking contexts — after a tens word ("twenty
      // second"), in "the second of <month>", or before a month name
      bool gated = tk.word == "second";
      if (gated) {
        bool tens_before = i > 0 && kTens.count(toks[i - 1].word) &&
                           toks[i - 1].suffix.empty();
        bool of_month = i + 2 < toks.size() && toks[i + 1].word == "of" &&
                        kMonthsEn.count(toks[i + 2].word);
        bool month_after = i + 1 < toks.size() &&
                           kMonthsEn.count(toks[i + 1].word);
        if (!(tens_before || of_month || month_after)) {
          out.push_back(tk.raw);
          ++i;
          continue;
        }
      }
    }
    if (ord != kOrdinalUnits.end()) {
      long long base = 0;
      std::string popped_prefix;
      bool popped = false;
      if (i > 0) {
        // "twenty fifth" -> 25th, "one hundred twenty fifth" -> 125th:
        // merge with the previous emission ONLY when it is a bare number
        // whose low two digits equal the pending tens value and no
        // punctuation separates them (popping unconditionally deleted
        // hundreds and merged across comma boundaries)
        long long tens;
        if (!out.empty() && kTens.count(toks[i - 1].word) &&
            toks[i - 1].suffix.empty() &&
            parse_cardinal(toks, i - 1, &tens) == 1) {
          const std::string &prev = out.back();
          size_t p0 = 0;
          while (p0 < prev.size() && !std::isdigit((unsigned char)prev[p0])) ++p0;
          size_t p1 = p0;
          while (p1 < prev.size() && std::isdigit((unsigned char)prev[p1])) ++p1;
          if (p0 < prev.size() && p1 == prev.size()) {
            long long val = std::stoll(prev.substr(p0));
            if (val % 100 == tens && tens > 0) {
              base = val;
              popped_prefix = prev.substr(0, p0);
              popped = true;
              out.pop_back();
            }
          }
        }
      }
      long long v = base + ord->second;
      const std::string &pfx = popped ? popped_prefix : tk.prefix;
      out.push_back(pfx + format_number(v) + ordinal_suffix(v) + tk.suffix);
      ++i;
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

      // time: "<hour> [minutes] am/pm" -> "5:30 p.m."; "<hour> o'clock"
      if (!negative && v >= 1 && v <= 24 && n <= 2) {
        auto ampm_at = [&](size_t p) -> std::string {
          if (p >= toks.size()) return "";
          const std::string& w = toks[p].word;
          if (w == "am" || w == "pm") return w == "am" ? "a.m." : "p.m.";
          if ((w == "a" || w == "p") && p + 1 < toks.size() &&
              toks[p + 1].word == "m")
            return w == "a" ? "a.m." : "p.m.";
          return "";
        };
        auto ampm_len = [&](size_t p) -> size_t {
          return toks[p].word.size() == 1 ? 2 : 1;
        };
        if (j < toks.size() &&
            (toks[j].word == "o'clock" || toks[j].word == "oclock")) {
          out.push_back(toks[i].prefix + num + " o'clock" + toks[j].suffix);
          i = j + 1;
          continue;
        }
        std::string marker = ampm_at(j);
        if (!marker.empty()) {  // "five pm" -> "5 p.m."
          size_t e = j + ampm_len(j);
          out.push_back(toks[i].prefix + num + " " + marker +
                        toks[e - 1].suffix);
          i = e;
          continue;
        }
        long long mins;
        size_t mn = toks[j - 1].suffix.empty()
                        ? parse_cardinal(toks, j, &mins) : 0;
        if (mn > 0 && mins >= 0 && mins <= 59) {
          marker = ampm_at(j + mn);
          if (!marker.empty()) {  // "five thirty p m" -> "5:30 p.m."
            size_t e = j + mn + ampm_len(j + mn);
            out.push_back(toks[i].prefix + num + ":" + two_digits(mins) +
                          " " + marker + toks[e - 1].suffix);
            i = e;
            continue;
          }
        }
      }

      // fraction: "three quarters" -> "3/4"; "one half" -> "1/2";
      // "five and two thirds" -> "5 2/3". Singular denominators only bind
      // to numerator 1 (else they are ordinals).
      if (!negative && j < toks.size()) {
        auto fr = kFracDen.find(toks[j].word);
        if (fr != kFracDen.end() &&
            (toks[j].word.back() == 's' || toks[j].word == "half" || v == 1)) {
          out.push_back(toks[i].prefix + num + "/" +
                        format_number(fr->second) + toks[j].suffix);
          i = j + 1;
          continue;
        }
        // whole-and-fraction composition
        if (toks[j].word == "and" && j + 1 < toks.size()) {
          long long fnum;
          size_t fn = parse_cardinal(toks, j + 1, &fnum);
          if (fn > 0 && j + 1 + fn < toks.size()) {
            auto fr2 = kFracDen.find(toks[j + 1 + fn].word);
            if (fr2 != kFracDen.end() &&
                (toks[j + 1 + fn].word.back() == 's' ||
                 toks[j + 1 + fn].word == "half" || fnum == 1)) {
              out.push_back(toks[i].prefix + num + " " + format_number(fnum) +
                            "/" + format_number(fr2->second) +
                            toks[j + 1 + fn].suffix);
              i = j + 2 + fn;
              continue;
            }
          }
        }
      }

      // decimal part: "point five nine"
      size_t last_consumed = i + n - 1;  // token carrying the final suffix
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
          last_consumed = k - 1;  // keep the last digit's punctuation
        }
      }
      // percent
      if (j < toks.size() && toks[j].word == "percent") {
        out.push_back(toks[i].prefix + num + "%" + toks[j].suffix);
        i = j + 1;
        continue;
      }
      // currency (+ cents composition: "five dollars and thirty cents"
      // -> "$5.30")
      if (j < toks.size() && kCurrency.count(toks[j].word)) {
        const std::string& sym = kCurrency.at(toks[j].word);
        size_t k = j + 1;
        if (sym != "¢" && k < toks.size() && toks[j].suffix.empty()) {
          size_t and_skip = (toks[k].word == "and") ? 1 : 0;
          long long cents;
          size_t cn = parse_cardinal(toks, k + and_skip, &cents);
          size_t cw = k + and_skip + cn;
          if (cn > 0 && cents >= 0 && cents <= 99 && cw < toks.size() &&
              (toks[cw].word == "cents" || toks[cw].word == "cent" ||
               toks[cw].word == "pence")) {
            out.push_back(toks[i].prefix + sym + num + "." +
                          two_digits(cents) + toks[cw].suffix);
            i = cw + 1;
            continue;
          }
        }
        out.push_back(toks[i].prefix + sym + num + toks[j].suffix);
        i = j + 1;
        continue;
      }
      out.push_back(toks[i].prefix + num + toks[last_consumed].suffix);
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
  if (!lang) return 0;
  return (std::strncmp(lang, "en", 2) == 0 || std::strncmp(lang, "de", 2) == 0 ||
          std::strncmp(lang, "fr", 2) == 0 || std::strncmp(lang, "es", 2) == 0 ||
          std::strncmp(lang, "pt", 2) == 0 || std::strncmp(lang, "it", 2) == 0 ||
          std::strncmp(lang, "ru", 2) == 0)
             ? 1 : 0;
}
