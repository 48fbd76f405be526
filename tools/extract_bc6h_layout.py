#!/usr/bin/env python3
"""Derive the BC6H (UF16) per-mode bit layouts by probing the Mesa
decoder, and emit bc6h_layout.h for the C++ decoder.

Method: for each mode prefix, decode probe blocks that isolate each bit's
effect:
  * with all indices 0 every texel shows endpoint e0 of its region;
  * with all indices max every texel shows the second endpoint;
  * flipping one payload bit and diffing classifies the bit into a field
    (which endpoint, which color channel) and its significance orders the
    bits within the field;
  * partition bits are found by giving region 1 a big delta and watching
    the spatial pattern switch.

The result is the public BC6H spec layout, reconstructed from behavior.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from superconductor_tpu.native.gldecode import decode_bc6h_gl

MODES_2BIT = [0b00, 0b01]
MODES_5BIT = [0b00010, 0b00110, 0b01010, 0b01110, 0b10010, 0b10110,
              0b11010, 0b11110, 0b00011, 0b00111, 0b01011, 0b01111]
ONE_REGION = {0b00011, 0b00111, 0b01011, 0b01111}


def make_block(mode, mode_bits, payload_bits, index_val=0, payload_override=None):
    """payload_bits: dict bitpos->value for bits mode_bits..(index_start-1).
    index region: 1-region modes: bits 65..127 (4bpp, anchor texel0 3 bits)
    2-region: bits 82..127 (3bpp, anchors t0 + partition anchor 2 bits)."""
    bits = [0] * 128
    for i in range(mode_bits):
        bits[i] = (mode >> i) & 1
    pl = dict(payload_bits)
    if payload_override:
        pl.update(payload_override)
    for pos, v in pl.items():
        bits[pos] = v
    one_region = mode in ONE_REGION
    idx_start = 65 if one_region else 82
    nbits_first = (4 if one_region else 3) - 1
    # All index bits share one value, so anchor positions (which only
    # shorten individual fields) don't change the decoded index values.
    for pos in range(idx_start, 128):
        bits[pos] = index_val & 1
    out = bytearray(16)
    for i, b in enumerate(bits):
        out[i // 8] |= b << (i % 8)
    return bytes(out)


def decode(block):
    return decode_bc6h_gl(block, 4, 4)[..., :3].reshape(16, 3)


def probe_mode(mode, mode_bits):
    one_region = mode in ONE_REGION
    idx_start = 65 if one_region else 82
    payload_range = list(range(mode_bits, idx_start))

    base0 = decode(make_block(mode, mode_bits, {}, 0))
    base1 = decode(make_block(mode, mode_bits, {}, 1))

    # classify each payload bit
    fields = {}  # name -> list of (bitpos, magnitude)
    for bit in payload_range:
        d0 = decode(make_block(mode, mode_bits, {bit: 1}, 0)) - base0
        d1 = decode(make_block(mode, mode_bits, {bit: 1}, 1)) - base1
        eff0 = np.abs(d0).max(axis=0)  # per channel
        eff1 = np.abs(d1).max(axis=0)
        if eff0.max() == 0 and eff1.max() == 0:
            fields.setdefault("part", []).append((bit, 0))
            continue
        chan = int(np.argmax(np.maximum(eff0, eff1)))
        cname = "rgb"[chan]
        # which texels changed tells which region; which probe (idx0/idx1)
        # tells which endpoint of the pair.
        changed0 = np.abs(d0[:, chan]) > 0
        changed1 = np.abs(d1[:, chan]) > 0
        # base (e0 of region 0) moves idx0 output of region0 texels; in
        # transformed modes it ALSO moves everything else. Classify by the
        # minimal footprint: e0-only bits only move idx0; e1 bits only move
        # idx1; region1 bits only move region1 texels (partition 0: with
        # payload zero, partition 0 pattern = kP2[0]: texels 0..? we can't
        # know here — instead use footprint sets directly).
        key = (
            cname,
            bool(changed0.any()),
            bool(changed1.any()),
            tuple(np.where(changed0 | changed1)[0].tolist()),
        )
        mag = float(max(np.abs(d0[:, chan]).max(), np.abs(d1[:, chan]).max()))
        fields.setdefault(key, []).append((bit, mag))
    return fields, base0, base1


def main():
    np.set_printoptions(suppress=True)
    all_modes = [(m, 2) for m in MODES_2BIT] + [(m, 5) for m in MODES_5BIT]
    for mode, mb in all_modes:
        fields, b0, b1 = probe_mode(mode, mb)
        print(f"mode {mode:#07b} ({mb}bit):")
        for key, bits in sorted(fields.items(), key=lambda kv: str(kv[0])):
            bitlist = [b for b, _ in sorted(bits, key=lambda x: x[1])]
            print(f"  {key if isinstance(key, str) else key[:3]}: {bitlist}")
    # Full table emission comes after inspection.


if __name__ == "__main__":
    main()
