"""Minimal spec-conformant FLAC *encoder* used only to build test fixtures
for the native decoder (native/flac.cc).  Supports constant, verbatim,
fixed-predictor (orders 0-4) and LPC subframes with Rice-coded residuals,
independent or left/right/mid-side stereo, correct CRC-8/CRC-16."""

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, n):
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value, n):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def data(self):
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def utf8_number(n):
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 + 5 * (nbytes - 1))) and nbytes < 7:
        nbytes += 1
    lead_bits = 7 - nbytes
    shift = 6 * (nbytes - 1)
    lead = (0xFF << (lead_bits + 1)) & 0xFF | (n >> shift)
    out.append(lead & 0xFF)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_write(bw, residuals, param):
    for v in residuals:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(residuals):
    if len(residuals) == 0:
        return 0
    mean = max(1.0, float(np.mean([abs(v) for v in residuals])))
    return min(14, max(0, int(np.ceil(np.log2(mean + 1)))))


def write_subframe(bw, samples, bps, mode="verbatim", order=2,
                   lpc_coefs=None, lpc_shift=0):
    bw.write(0, 1)  # reserved
    samples = [int(s) for s in samples]
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(samples[0], bps)
        return
    if mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(s, bps)
        return
    if mode == "fixed":
        bw.write(0x08 | order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, bps)
        res = []
        for i in range(order, len(samples)):
            if order == 0:
                p = 0
            elif order == 1:
                p = samples[i - 1]
            elif order == 2:
                p = 2 * samples[i - 1] - samples[i - 2]
            elif order == 3:
                p = 3 * samples[i - 1] - 3 * samples[i - 2] + samples[i - 3]
            else:
                p = (4 * samples[i - 1] - 6 * samples[i - 2]
                     + 4 * samples[i - 3] - samples[i - 4])
            res.append(samples[i] - p)
        _write_residual(bw, res, order)
        return
    if mode == "lpc":
        coefs = lpc_coefs
        order = len(coefs)
        bw.write(0x20 | (order - 1), 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, bps)
        precision = 15
        bw.write(precision - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = []
        for i in range(order, len(samples)):
            p = sum(coefs[j] * samples[i - 1 - j] for j in range(order))
            res.append(samples[i] - (p >> lpc_shift))
        _write_residual(bw, res, order)
        return
    raise ValueError(mode)


def _write_residual(bw, res, order):
    bw.write(0, 2)  # Rice method 0 (4-bit params)
    bw.write(0, 4)  # partition order 0: single partition
    param = _best_rice_param(res)
    bw.write(param, 4)
    _rice_write(bw, res, param)


def encode_flac(samples, sample_rate, bps=16, blocksize=256,
                subframe_mode="verbatim", fixed_order=2,
                lpc_coefs=None, lpc_shift=0, stereo_mode="independent"):
    """samples: int array [frames] or [frames, channels]."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(frames, 36)
    si_bytes = si.data() + b"\x00" * 16  # MD5 unset
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    for fi, start in enumerate(range(0, frames, blocksize)):
        block = samples[start : start + blocksize]
        bs = block.shape[0]
        if bs < blocksize:
            block = np.pad(block, ((0, blocksize - bs), (0, 0)))
        hdr = BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocking
        hdr.write(7, 4)  # 16-bit blocksize-1 follows
        hdr.write(0, 4)  # sample rate from STREAMINFO
        if channels == 2 and stereo_mode == "left_side":
            hdr.write(8, 4)
        elif channels == 2 and stereo_mode == "right_side":
            hdr.write(9, 4)
        elif channels == 2 and stereo_mode == "mid_side":
            hdr.write(10, 4)
        else:
            hdr.write(channels - 1, 4)
        hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        hdr.write(0, 1)
        hdr_bytes = bytearray(hdr.data())
        hdr_bytes += utf8_number(fi)
        hdr_bytes += (blocksize - 1).to_bytes(2, "big")
        hdr_bytes.append(crc8(hdr_bytes))

        body = BitWriter()
        chans = []
        extra = [0] * channels
        if channels == 2 and stereo_mode != "independent":
            left = block[:, 0]
            right = block[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                chans, extra = [left, side], [0, 1]
            elif stereo_mode == "right_side":
                chans, extra = [side, right], [1, 0]
            else:  # mid_side
                mid = (left + right) >> 1
                chans, extra = [mid, side], [0, 1]
        else:
            chans = [block[:, c] for c in range(channels)]
        for c, ch in enumerate(chans):
            write_subframe(body, ch, bps + extra[c], subframe_mode,
                           fixed_order, lpc_coefs, lpc_shift)
        body.align()
        frame = bytes(hdr_bytes) + body.data()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)
