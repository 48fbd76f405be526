"""Extract ASTC color-unquantization ground truth from the Mesa GL oracle
and diff it against the C++ decoder's tables.

Method: craft blocks using CEM 4 (luminance+alpha direct — no endpoint
transforms), all-zero weights, with the weight grid/quant chosen so the
color ISE lands on a target quantization level. The first color value v0
is placed with chosen (digit, bits) in the first ISE group; the decoded
texel's red channel then equals unquant_color(v0) exactly.

Usage: python tools/astc_unquant_check.py
"""

import ctypes
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from superconductor_tpu.native import load_native
from superconductor_tpu.native.gldecode import decode_astc4x4_gl

REV = [int(f"{i:08b}"[::-1], 2) for i in range(256)]

QUANTS = {  # levels: (bits, trits, quints)
    6: (1, 1, 0), 8: (3, 0, 0), 10: (1, 0, 1), 12: (2, 1, 0), 16: (4, 0, 0),
    20: (2, 0, 1), 24: (3, 1, 0), 32: (5, 0, 0), 40: (3, 0, 1),
    48: (4, 1, 0), 64: (6, 0, 0), 80: (4, 0, 1), 96: (5, 1, 0),
    128: (7, 0, 0), 160: (5, 0, 1), 192: (6, 1, 0), 256: (8, 0, 0),
}
WQUANTS = {2: (1, 0, 0), 3: (0, 1, 0), 4: (2, 0, 0), 5: (0, 0, 1),
           6: (1, 1, 0), 8: (3, 0, 0), 10: (1, 0, 1), 12: (2, 1, 0),
           16: (4, 0, 0), 20: (2, 0, 1), 24: (3, 1, 0), 32: (5, 0, 0)}


def ise_bits(spec, count):
    bits, t, q = spec
    n = count * bits
    if t:
        n += (count * 8 + 4) // 5
    if q:
        n += (count * 7 + 2) // 3
    return n


def set_bits(buf, pos, count, val):
    for i in range(count):
        if (val >> i) & 1:
            buf[(pos + i) // 8] |= 1 << ((pos + i) % 8)


def make_mode(gw, gh, wlevels):
    """Block mode bits for a (gw, gh) grid at wlevels (case-0 layout only:
    gw in 4..7, gh in 2..5)."""
    r_of = {2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 8: 7,
            10: 2, 12: 3, 16: 4, 20: 5, 24: 6, 32: 7}
    H = 1 if wlevels >= 10 else 0
    r = r_of[wlevels]
    B = gw - 4
    A = gh - 2
    assert 0 <= B <= 3 and 0 <= A <= 3
    return (((r >> 2) & 1) << 1) | ((r >> 1) & 1) | ((r & 1) << 4) | \
        (A << 5) | (B << 7) | (H << 9)


def quant_for(avail, nvals):
    for lv in sorted(QUANTS, reverse=True):
        if ise_bits(QUANTS[lv], nvals) <= avail:
            return lv
    return None


def find_config(target_levels):
    """(nparts, gw, gh, wlevels) putting the color ISE at target_levels."""
    for nparts in (1, 2, 3):
        nvals = 4 * nparts
        if nvals > 18:
            continue
        header = 17 if nparts == 1 else 29
        for gw in (4, 5, 6, 7):
            for gh in (2, 3, 4, 5):
                if gw > 4 or gh > 4:
                    continue  # 4x4 blocks
                for wl in WQUANTS:
                    wb = ise_bits(WQUANTS[wl], gw * gh)
                    if wb < 24 or wb > 96:
                        continue
                    avail = 128 - header - wb
                    if avail < 0:
                        continue
                    if quant_for(avail, nvals) == target_levels:
                        return nparts, gw, gh, wl
    return None


def first_value_bits(spec, d, m):
    """Bit pattern (lsb-first) for the color ISE so value 0 = (d, m)."""
    bits, t, q = spec
    if t:
        # m0 then T[1:0] = d (sets t0 = d, others 0)
        return m | (d << bits), bits + 2
    if q:
        qmap = {0: 0, 1: 1, 2: 2, 3: 3, 4: 6}
        return m | (qmap[d] << bits), bits + 3
    return m, bits


def extract(levels):
    cfg = find_config(levels)
    assert cfg, levels
    nparts, gw, gh, wl = cfg
    spec = QUANTS[levels]
    bits, t, q = spec
    ndigits = 3 if t else (5 if q else 1)
    table = {}
    for d in range(ndigits):
        for m in range(1 << bits):
            b = bytearray(16)
            set_bits(b, 0, 11, make_mode(gw, gh, wl))
            set_bits(b, 11, 2, nparts - 1)
            if nparts == 1:
                set_bits(b, 13, 4, 4)  # CEM 4
                cstart = 17
            else:
                set_bits(b, 13, 10, 0)  # seed 0
                set_bits(b, 23, 6, 4 << 2)  # C=0, all CEM 4
                cstart = 29
            val, nb = first_value_bits(spec, d, m)
            set_bits(b, cstart, nb, val)
            img = decode_astc4x4_gl(bytes(b), 4, 4)
            # partition of texel (0,0) under seed 0 may not be 0; CEM 4 with
            # all-zero other values decodes partition!=0 texels to 0. Use
            # the max over the block: only v0 is nonzero -> partition 0's
            # luminance; for (d,m)=(0,0) everything is 0 anyway.
            table[(d, m)] = int(img[..., 0].max())
    return table


def main():
    lib = load_native()
    assert lib is not None
    bad = 0
    for levels in sorted(QUANTS):
        table = extract(levels)
        for (d, m), ref in sorted(table.items()):
            mine = lib.sc_astc_unquant_color(levels, d, m)
            if mine != ref:
                bad += 1
                print(f"levels {levels}: (d={d}, m={m:#04x}) mine={mine} ref={ref}")
    print("mismatched entries:", bad)


if __name__ == "__main__":
    main()
