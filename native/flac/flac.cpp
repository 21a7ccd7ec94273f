// Native FLAC decoder — see flac.h for the role and supported subset.
//
// Written from the FLAC format specification (RFC 9639 / xiph.org format
// description): metadata blocks -> STREAMINFO; frames with UTF-8-coded
// ordinals; subframes CONSTANT/VERBATIM/FIXED(0-4)/LPC(1-32); rice-coded
// residual partitions with escape codes; wasted-bits shift; stereo
// decorrelation left-side/right-side/mid-side. CRCs are parsed but not
// verified (decode is for trusted local corpus staging, not streaming
// resync).

#include "flac.h"

#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte = 0;
  int bit = 0;  // bits consumed of current byte (0..7)
  bool overrun = false;

  explicit BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool at_end() const { return byte >= size; }

  void align() {
    if (bit) {
      bit = 0;
      ++byte;
    }
  }

  uint32_t read_bit() {
    if (byte >= size) {
      overrun = true;
      return 0;
    }
    uint32_t v = (data[byte] >> (7 - bit)) & 1u;
    if (++bit == 8) {
      bit = 0;
      ++byte;
    }
    return v;
  }

  uint64_t read_bits(int n) {  // n <= 57
    uint64_t v = 0;
    while (n > 0) {
      if (byte >= size) {
        overrun = true;
        return v << n;
      }
      int avail = 8 - bit;
      int take = n < avail ? n : avail;
      uint32_t chunk = (data[byte] >> (avail - take)) & ((1u << take) - 1u);
      v = (v << take) | chunk;
      bit += take;
      if (bit == 8) {
        bit = 0;
        ++byte;
      }
      n -= take;
    }
    return v;
  }

  int64_t read_signed(int n) {
    if (n == 0) return 0;
    uint64_t v = read_bits(n);
    uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? (int64_t)(v - (sign << 1)) : (int64_t)v;
  }

  uint32_t read_unary() {
    uint32_t n = 0;
    while (!overrun && read_bit() == 0) {
      ++n;
      if (n > 1u << 24) {  // corrupt stream guard
        overrun = true;
        break;
      }
    }
    return n;
  }

  // Rice/Golomb: unary quotient + k-bit remainder, zig-zag to signed.
  int64_t read_rice(int k) {
    uint64_t q = read_unary();
    uint64_t u = (q << k) | read_bits(k);
    return (u & 1) ? -(int64_t)(u >> 1) - 1 : (int64_t)(u >> 1);
  }
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits = 0;
  uint64_t total_samples = 0;
  uint32_t max_block = 0;
};

// Frame-header UTF-8-style coded number (up to 36 bits / 7 bytes).
bool skip_coded_number(BitReader& br) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  int follow = 0;
  if (b0 < 0x80) {
    follow = 0;
  } else if ((b0 & 0xE0) == 0xC0) {
    follow = 1;
  } else if ((b0 & 0xF0) == 0xE0) {
    follow = 2;
  } else if ((b0 & 0xF8) == 0xF0) {
    follow = 3;
  } else if ((b0 & 0xFC) == 0xF8) {
    follow = 4;
  } else if ((b0 & 0xFE) == 0xFC) {
    follow = 5;
  } else if (b0 == 0xFE) {
    follow = 6;
  } else {
    return false;
  }
  for (int i = 0; i < follow; ++i) {
    if (((uint32_t)br.read_bits(8) & 0xC0) != 0x80) return false;
  }
  return !br.overrun;
}

int decode_residual(BitReader& br, int order, uint32_t block_size,
                    int64_t* out /* block_size entries, first `order` set */) {
  uint32_t method = (uint32_t)br.read_bits(2);
  if (method > 1) return FLAC_ERR_UNSUPPORTED;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t part_order = (uint32_t)br.read_bits(4);
  uint32_t n_parts = 1u << part_order;
  if ((block_size >> part_order) << part_order != block_size) return FLAC_ERR_CORRUPT;
  uint32_t idx = order;
  for (uint32_t p = 0; p < n_parts; ++p) {
    uint32_t count = block_size >> part_order;
    if (p == 0) {
      if (count < (uint32_t)order) return FLAC_ERR_CORRUPT;
      count -= order;
    }
    uint32_t k = (uint32_t)br.read_bits(param_bits);
    if (k == escape) {
      uint32_t raw_bits = (uint32_t)br.read_bits(5);
      for (uint32_t i = 0; i < count; ++i) out[idx++] = br.read_signed((int)raw_bits);
    } else {
      for (uint32_t i = 0; i < count; ++i) out[idx++] = br.read_rice((int)k);
    }
    if (br.overrun) return FLAC_ERR_TRUNCATED;
  }
  return FLAC_OK;
}

int decode_subframe(BitReader& br, uint32_t block_size, int bps,
                    std::vector<int64_t>& out) {
  out.assign(block_size, 0);
  if (br.read_bit() != 0) return FLAC_ERR_CORRUPT;  // padding bit
  uint32_t type = (uint32_t)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) wasted = (int)br.read_unary() + 1;
  if (br.overrun) return FLAC_ERR_TRUNCATED;
  int eff_bps = bps - wasted;
  if (eff_bps <= 0 || eff_bps > 33) return FLAC_ERR_CORRUPT;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(eff_bps);
    for (uint32_t i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (uint32_t i = 0; i < block_size; ++i) out[i] = br.read_signed(eff_bps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0-4
    int order = (int)type - 8;
    if ((uint32_t)order > block_size) return FLAC_ERR_CORRUPT;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(eff_bps);
    int st = decode_residual(br, order, block_size, out.data());
    if (st != FLAC_OK) return st;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t pred = 0;
      switch (order) {
        case 0: pred = 0; break;
        case 1: pred = out[i - 1]; break;
        case 2: pred = 2 * out[i - 1] - out[i - 2]; break;
        case 3: pred = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4:
          pred = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4];
          break;
      }
      out[i] += pred;
    }
  } else if (type >= 32) {  // LPC, order 1-32
    int order = (int)type - 31;
    if ((uint32_t)order > block_size) return FLAC_ERR_CORRUPT;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(eff_bps);
    uint32_t prec = (uint32_t)br.read_bits(4);
    if (prec == 0xF) return FLAC_ERR_CORRUPT;
    int precision = (int)prec + 1;
    int shift = (int)br.read_signed(5);
    if (shift < 0) return FLAC_ERR_CORRUPT;
    int64_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    int st = decode_residual(br, order, block_size, out.data());
    if (st != FLAC_OK) return st;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * out[i - 1 - j];
      out[i] += pred >> shift;
    }
  } else {
    return FLAC_ERR_UNSUPPORTED;  // reserved types 2-7, 13-31
  }
  if (br.overrun) return FLAC_ERR_TRUNCATED;
  if (wasted) {
    for (uint32_t i = 0; i < block_size; ++i) out[i] <<= wasted;
  }
  return FLAC_OK;
}

}  // namespace

extern "C" int flac_decode_int16(const uint8_t* data, size_t size,
                                 int16_t** out_samples, uint64_t* out_frames,
                                 uint32_t* out_sample_rate,
                                 uint32_t* out_channels,
                                 uint32_t* out_bits_per_sample) {
  if (!data || size < 42 || memcmp(data, "fLaC", 4) != 0) return FLAC_ERR_NOT_FLAC;
  *out_samples = nullptr;
  *out_frames = 0;

  // ---- metadata blocks ----
  size_t pos = 4;
  StreamInfo info;
  bool have_info = false;
  bool last = false;
  while (!last) {
    if (pos + 4 > size) return FLAC_ERR_TRUNCATED;
    last = (data[pos] & 0x80) != 0;
    uint32_t btype = data[pos] & 0x7F;
    uint32_t blen =
        ((uint32_t)data[pos + 1] << 16) | ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (pos + blen > size) return FLAC_ERR_TRUNCATED;
    if (btype == 0 && blen >= 34) {  // STREAMINFO
      const uint8_t* p = data + pos;
      info.max_block = ((uint32_t)p[2] << 8) | p[3];
      info.sample_rate = ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) | (p[12] >> 4);
      info.channels = ((p[12] >> 1) & 0x7) + 1;
      info.bits = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      info.total_samples = ((uint64_t)(p[13] & 0xF) << 32) | ((uint64_t)p[14] << 24) |
                           ((uint64_t)p[15] << 16) | ((uint64_t)p[16] << 8) | p[17];
      have_info = true;
    }
    pos += blen;
  }
  if (!have_info || info.sample_rate == 0 || info.channels == 0) return FLAC_ERR_NOT_FLAC;

  *out_sample_rate = info.sample_rate;
  *out_channels = info.channels;
  *out_bits_per_sample = info.bits;

  std::vector<int16_t> pcm;
  if (info.total_samples) {
    if (info.total_samples * info.channels > (1ull << 33))
      return FLAC_ERR_UNSUPPORTED;  // >8G samples: refuse silly allocations
    pcm.reserve((size_t)(info.total_samples * info.channels));
  }

  static const uint32_t kBlockSizes[16] = {0,   192, 576,  1152, 2304, 4608, 0, 0,
                                           256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
  static const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

  BitReader br(data, size);
  br.byte = pos;
  std::vector<std::vector<int64_t>> ch(info.channels);

  while (br.byte < size) {
    // frame sync: 14 bits 0b11111111111110
    uint32_t sync = (uint32_t)br.read_bits(14);
    if (br.overrun || br.at_end()) break;
    if (sync != 0x3FFE) return FLAC_ERR_CORRUPT;
    if (br.read_bit() != 0) return FLAC_ERR_UNSUPPORTED;  // reserved
    br.read_bit();  // blocking strategy
    uint32_t bs_code = (uint32_t)br.read_bits(4);
    uint32_t sr_code = (uint32_t)br.read_bits(4);
    uint32_t ch_code = (uint32_t)br.read_bits(4);
    uint32_t ss_code = (uint32_t)br.read_bits(3);
    br.read_bit();  // reserved
    if (!skip_coded_number(br)) return FLAC_ERR_CORRUPT;

    uint32_t block_size;
    if (bs_code == 0) return FLAC_ERR_CORRUPT;
    if (bs_code == 6) {
      block_size = (uint32_t)br.read_bits(8) + 1;
    } else if (bs_code == 7) {
      block_size = (uint32_t)br.read_bits(16) + 1;
    } else {
      block_size = kBlockSizes[bs_code];
      if (block_size == 0) return FLAC_ERR_CORRUPT;
    }
    if (sr_code == 12) {
      br.read_bits(8);
    } else if (sr_code == 13 || sr_code == 14) {
      br.read_bits(16);
    } else if (sr_code == 15) {
      return FLAC_ERR_CORRUPT;
    }
    int bps = ss_code == 0 ? (int)info.bits : kSampleSizes[ss_code];
    if (bps == 0) return FLAC_ERR_UNSUPPORTED;
    br.read_bits(8);  // header CRC-8 (not verified)
    if (br.overrun) return FLAC_ERR_TRUNCATED;

    uint32_t n_ch;
    int decor = 0;  // 0 none, 1 left-side, 2 right-side, 3 mid-side
    if (ch_code < 8) {
      n_ch = ch_code + 1;
    } else if (ch_code <= 10) {
      n_ch = 2;
      decor = (int)ch_code - 7;
    } else {
      return FLAC_ERR_UNSUPPORTED;
    }
    if (n_ch != info.channels) return FLAC_ERR_CORRUPT;

    for (uint32_t c = 0; c < n_ch; ++c) {
      // the side channel of a decorrelated pair carries one extra bit
      int sub_bps = bps;
      if ((decor == 1 && c == 1) || (decor == 2 && c == 0) ||
          (decor == 3 && c == 1))
        sub_bps += 1;
      int st = decode_subframe(br, block_size, sub_bps, ch[c]);
      if (st != FLAC_OK) return st;
    }
    br.align();
    br.read_bits(16);  // frame CRC-16 (not verified)
    if (br.overrun) return FLAC_ERR_TRUNCATED;

    // ---- undo stereo decorrelation ----
    if (decor == 1) {  // left/side: right = left - side
      for (uint32_t i = 0; i < block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (decor == 2) {  // right/side: left = side + right
      for (uint32_t i = 0; i < block_size; ++i) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (decor == 3) {  // mid/side
      for (uint32_t i = 0; i < block_size; ++i) {
        int64_t side = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    // ---- interleave to int16 ----
    int shift = bps - 16;  // >16-bit sources are rounded down, <16 scaled up
    size_t base = pcm.size();
    pcm.resize(base + (size_t)block_size * n_ch);
    for (uint32_t i = 0; i < block_size; ++i) {
      for (uint32_t c = 0; c < n_ch; ++c) {
        int64_t v = shift >= 0 ? (ch[c][i] >> shift) : (ch[c][i] << -shift);
        if (v > 32767) v = 32767;
        if (v < -32768) v = -32768;
        pcm[base + (size_t)i * n_ch + c] = (int16_t)v;
      }
    }

    if (info.total_samples &&
        pcm.size() >= info.total_samples * info.channels) {
      pcm.resize((size_t)(info.total_samples * info.channels));
      break;  // last frame may be padded; STREAMINFO count wins
    }
    // tolerate trailing garbage/ID3 after the last frame when total known
  }

  uint64_t frames = pcm.size() / info.channels;
  int16_t* out = (int16_t*)malloc(pcm.size() * sizeof(int16_t) + 1);
  if (!out) return FLAC_ERR_ALLOC;
  memcpy(out, pcm.data(), pcm.size() * sizeof(int16_t));
  *out_samples = out;
  *out_frames = frames;
  return FLAC_OK;
}

extern "C" void flac_free(void* p) { free(p); }
