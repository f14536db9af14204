// Minimal FLAC decoder for LibriSpeech-style inputs.
//
// The reference pipeline reads LibriSpeech FLAC through
// soundfile/libsndfile (/root/reference/datasets/preprocess_librispeech.py);
// neither is available here, so the framework ships its own decoder.
// Supports the full fixed-predictor + LPC subset used by the `flac`
// reference encoder: metadata skip, constant/verbatim/fixed(0-4)/LPC(1-32)
// subframes, Rice/Rice2 residual partitions with escape codes, wasted
// bits, and left/right/mid-side stereo decorrelation.  CRCs are parsed but
// not verified (decode speed matters more than tamper detection for local
// dataset files).
//
// C ABI (ctypes):
//   tw_flac_decode_alloc(data, len, info[4]) -> int32* (interleaved) or NULL
//     info out: [sample_rate, channels, bits_per_sample, frames_decoded]
//   tw_flac_free(ptr)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  int64_t len;
  int64_t byte = 0;
  int bit = 0;  // bits consumed in current byte (0..7)
  bool err = false;

  bool eof() const { return byte >= len; }

  uint32_t read_bit() {
    if (byte >= len) {
      err = true;
      return 0;
    }
    uint32_t b = (data[byte] >> (7 - bit)) & 1u;
    if (++bit == 8) {
      bit = 0;
      ++byte;
    }
    return b;
  }

  uint64_t read(int n) {
    uint64_t v = 0;
    // byte-aligned fast path
    while (n >= 8 && bit == 0 && byte < len) {
      v = (v << 8) | data[byte++];
      n -= 8;
    }
    while (n-- > 0) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (n == 0) return 0;
    uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? (int64_t)(v | ~((sign << 1) - 1)) : (int64_t)v;
  }

  uint64_t read_unary() {
    uint64_t q = 0;
    while (!err && read_bit() == 0) {
      ++q;
      if (q > (uint64_t)len * 8) {
        err = true;
        break;
      }
    }
    return q;
  }

  void align() {
    if (bit) {
      bit = 0;
      ++byte;
    }
  }
};

// Frame/sample number: UTF-8 style coding extended to 36 bits.
bool read_coded_number(BitReader& br, uint64_t* out) {
  uint32_t b0 = (uint32_t)br.read(8);
  if (br.err) return false;
  int n_cont = 0;
  uint64_t v;
  if ((b0 & 0x80) == 0) {
    v = b0;
  } else {
    uint32_t mask = 0x40;
    n_cont = 0;
    while (b0 & mask) {
      ++n_cont;
      mask >>= 1;
    }
    if (n_cont < 1 || n_cont > 6) return false;
    v = b0 & (mask - 1);
    for (int i = 0; i < n_cont; ++i) {
      uint32_t c = (uint32_t)br.read(8);
      if (br.err || (c & 0xC0) != 0x80) return false;
      v = (v << 6) | (c & 0x3F);
    }
  }
  *out = v;
  return true;
}

bool decode_residual(BitReader& br, int64_t blocksize, int order,
                     int64_t* out) {
  uint32_t method = (uint32_t)br.read(2);
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = (uint32_t)br.read(4);
  int64_t nparts = 1ll << porder;
  if (blocksize % nparts) return false;
  int64_t psize = blocksize >> porder;
  if (psize <= order && nparts == 1) return false;
  int64_t idx = order;
  for (int64_t p = 0; p < nparts; ++p) {
    int64_t count = psize - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = (uint32_t)br.read(pbits);
    if (param == escape) {
      int raw = (int)br.read(5);
      for (int64_t i = 0; i < count; ++i) out[idx++] = br.read_signed(raw);
    } else {
      for (int64_t i = 0; i < count; ++i) {
        uint64_t q = br.read_unary();
        uint64_t u = (q << param) | br.read(param);
        out[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
    if (br.err) return false;
  }
  return idx == blocksize;
}

bool decode_subframe(BitReader& br, int64_t blocksize, int bps,
                     std::vector<int64_t>& out) {
  if (br.read_bit() != 0) return false;  // reserved
  uint32_t type = (uint32_t)br.read(6);
  int wasted = 0;
  if (br.read_bit()) wasted = 1 + (int)br.read_unary();
  bps -= wasted;
  if (bps <= 0 || br.err) return false;
  out.assign(blocksize, 0);

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int64_t i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int64_t i = 0; i < blocksize; ++i) out[i] = br.read_signed(bps);
  } else if ((type & 0x38) == 0x08 && (type & 7) <= 4) {  // FIXED
    int order = type & 7;
    if (order > blocksize) return false;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    if (!decode_residual(br, blocksize, order, out.data())) return false;
    for (int64_t i = order; i < blocksize; ++i) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4:
          p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4];
          break;
      }
      out[i] += p;
    }
  } else if (type & 0x20) {  // LPC
    int order = (type & 0x1F) + 1;
    if (order > blocksize) return false;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    int precision = (int)br.read(4) + 1;
    if (precision == 16) return false;  // 1111 is invalid
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    if (!decode_residual(br, blocksize, order, out.data())) return false;
    for (int64_t i = order; i < blocksize; ++i) {
      int64_t p = 0;
      for (int j = 0; j < order; ++j) p += coef[j] * out[i - 1 - j];
      out[i] += p >> shift;
    }
  } else {
    return false;
  }
  if (wasted)
    for (int64_t i = 0; i < blocksize; ++i) out[i] <<= wasted;
  return !br.err;
}

}  // namespace

extern "C" {

int32_t* tw_flac_decode_alloc(const uint8_t* data, int64_t len,
                              int64_t* info) {
  info[0] = info[1] = info[2] = info[3] = 0;
  if (len < 42 || std::memcmp(data, "fLaC", 4) != 0) return nullptr;
  int64_t pos = 4;
  int64_t sample_rate = 0, channels = 0, bps = 0;
  uint64_t total = 0;
  bool last = false, have_streaminfo = false;
  while (!last && pos + 4 <= len) {
    uint8_t hdr = data[pos];
    last = hdr & 0x80;
    int type = hdr & 0x7F;
    int64_t blen =
        ((int64_t)data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (pos + blen > len) return nullptr;
    if (type == 0 && blen >= 34) {  // STREAMINFO
      const uint8_t* p = data + pos;
      sample_rate = ((int64_t)p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
      channels = ((p[12] >> 1) & 7) + 1;
      bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      total = ((uint64_t)(p[13] & 0xF) << 32) | ((uint64_t)p[14] << 24) |
              (p[15] << 16) | (p[16] << 8) | p[17];
      have_streaminfo = true;
    }
    pos += blen;
  }
  if (!have_streaminfo || sample_rate == 0 || channels < 1 || channels > 8)
    return nullptr;

  std::vector<int32_t> pcm;
  if (total) pcm.reserve(total * channels);
  std::vector<std::vector<int64_t>> ch(channels);

  BitReader br{data, len};
  br.byte = pos;
  while (br.byte < len) {
    // frame header
    uint64_t sync = br.read(14);
    if (br.err) break;
    if (sync != 0x3FFE) return nullptr;
    br.read_bit();  // reserved
    br.read_bit();  // blocking strategy
    uint32_t bs_code = (uint32_t)br.read(4);
    uint32_t sr_code = (uint32_t)br.read(4);
    uint32_t ch_code = (uint32_t)br.read(4);
    uint32_t ss_code = (uint32_t)br.read(3);
    br.read_bit();  // reserved
    uint64_t dummy;
    if (!read_coded_number(br, &dummy)) return nullptr;
    int64_t blocksize;
    switch (bs_code) {
      case 0: return nullptr;
      case 1: blocksize = 192; break;
      case 6: blocksize = (int64_t)br.read(8) + 1; break;
      case 7: blocksize = (int64_t)br.read(16) + 1; break;
      default:
        blocksize = bs_code <= 5 ? (576ll << (bs_code - 2))
                                 : (256ll << (bs_code - 8));
    }
    if (sr_code == 12) br.read(8);
    else if (sr_code == 13 || sr_code == 14) br.read(16);
    else if (sr_code == 15) return nullptr;
    int frame_bps;
    switch (ss_code) {
      case 0: frame_bps = (int)bps; break;
      case 1: frame_bps = 8; break;
      case 2: frame_bps = 12; break;
      case 4: frame_bps = 16; break;
      case 5: frame_bps = 20; break;
      case 6: frame_bps = 24; break;
      case 7: frame_bps = 32; break;
      default: return nullptr;
    }
    br.read(8);  // CRC-8
    if (br.err) return nullptr;

    int nch;
    int stereo_mode = 0;  // 0 independent, 1 L/S, 2 R/S, 3 M/S
    if (ch_code < 8) {
      nch = (int)ch_code + 1;
    } else if (ch_code <= 10) {
      nch = 2;
      stereo_mode = (int)ch_code - 7;
    } else {
      return nullptr;
    }
    if (nch != channels) return nullptr;

    for (int c = 0; c < nch; ++c) {
      int sub_bps = frame_bps;
      if ((stereo_mode == 1 && c == 1) || (stereo_mode == 2 && c == 0) ||
          (stereo_mode == 3 && c == 1))
        ++sub_bps;  // side channel carries one extra bit
      if (!decode_subframe(br, blocksize, sub_bps, ch[c])) return nullptr;
    }
    br.align();
    br.read(16);  // CRC-16
    if (br.err) return nullptr;

    if (stereo_mode == 1) {  // left/side: right = left - side
      for (int64_t i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (stereo_mode == 2) {  // right/side: left = side + right
      for (int64_t i = 0; i < blocksize; ++i) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (stereo_mode == 3) {  // mid/side
      for (int64_t i = 0; i < blocksize; ++i) {
        int64_t mid = (ch[0][i] << 1) | (ch[1][i] & 1);
        int64_t side = ch[1][i];
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }
    for (int64_t i = 0; i < blocksize; ++i)
      for (int c = 0; c < nch; ++c) pcm.push_back((int32_t)ch[c][i]);
    info[3] += blocksize;
    if (total && (uint64_t)info[3] >= total) break;
  }
  if (total && (uint64_t)info[3] > total) {
    // last frame may be padded; trim to the STREAMINFO count
    info[3] = (int64_t)total;
    pcm.resize(total * channels);
  }
  info[0] = sample_rate;
  info[1] = channels;
  info[2] = bps;
  int32_t* out = (int32_t*)std::malloc(pcm.size() * sizeof(int32_t));
  if (!out) return nullptr;
  std::memcpy(out, pcm.data(), pcm.size() * sizeof(int32_t));
  return out;
}

void tw_flac_free(int32_t* p) { std::free(p); }

}  // extern "C"
