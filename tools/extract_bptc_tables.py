#!/usr/bin/env python3
"""Extract BC7 partition + anchor tables from the Mesa llvmpipe BPTC
decoder (oracle probing — derives the public constant tables from decode
behavior, no third-party source involved). Writes bptc_tables.h."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
from superconductor_tpu.native.gldecode import decode_bc7_gl


class Bits:
    def __init__(self):
        self.bits = []
    def put(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)
    def to_bytes(self):
        assert len(self.bits) == 128, len(self.bits)
        out = bytearray(16)
        for i, b in enumerate(self.bits):
            out[i // 8] |= b << (i % 8)
        return bytes(out)


def mode1_block(partition, eps=None, p0=0, p1=0, index_bits=None):
    """BC7 mode 1: 2 subsets, 6-bit partition, RGB 666, 2 shared P bits,
    46 index bits (3bpp, two anchors with 2 bits).

    eps: 4 endpoint rgb tuples in storage order
    (s0.e0, s0.e1, s1.e0, s1.e1); default paints subset ids."""
    if eps is None:
        eps = ((0,0,0), (0,0,0), (63,63,63), (63,63,63))
    b = Bits()
    b.put(0b10, 2)           # mode 1 marker: bit0=0, bit1=1
    b.put(partition, 6)
    for chan in range(3):
        for e in eps:
            b.put(e[chan], 6)
    b.put(p0, 1); b.put(p1, 1)
    rem = 128 - len(b.bits)
    if index_bits is None:
        b.put(0, rem)
    else:
        for bit in index_bits[:rem]:
            b.bits.append(bit)
    return b.to_bytes()


def extract_p2():
    table = []
    for part in range(64):
        blk = mode1_block(part)
        out = decode_bc7_gl(blk, 4, 4).reshape(16, 4)
        row = [1 if px[0] > 128 else 0 for px in out]
        assert row[0] == 0, (part, row)  # texel 0 is always subset 0
        table.append(row)
    return table


def extract_anchors2(p2):
    """Anchor position of subset 1 per partition: the anchor texel's index
    field has 2 bits instead of 3. Try each candidate position; the one
    whose predicted bit layout reproduces the oracle on a probe block wins."""
    anchors = []
    for part in range(64):
        subset = p2[part]
        got = None
        for anchor in range(16):
            # predict & probe: indices all = 1 (gives weight 21/64 blend)
            # layout: texel0: 2 bits (anchor of subset0), others 3 bits,
            # anchor texel: 2 bits.
            bits = []
            for t in range(16):
                n = 2 if (t == 0 or t == anchor) else 3
                # write index value 1 -> bits lsb first: 1,0(,0)
                bits.extend([1] + [0] * (n - 1))
            blk = mode1_block(
                part,
                eps=((0,0,0), (63,63,63), (0,0,0), (63,63,63)),
                index_bits=bits,
            )
            out = decode_bc7_gl(blk, 4, 4).reshape(16, 4)
            # weight w3[1]=9 -> value ~ 9/64*255 = 35.9 for every texel
            ok = all(abs(int(px[0]) - 36) <= 3 for px in out)
            if ok:
                got = anchor
                break
        assert got is not None, part
        anchors.append(got)
    return anchors


def mode2_block(partition, levels=((0,0,0),(15,15,15),(31,31,31)), index_bits=None):
    """BC7 mode 2: 3 subsets, 6-bit partition, RGB 555, 29 index bits (2bpp)."""
    b = Bits()
    b.put(0b100, 3)
    b.put(partition, 6)
    for chan in range(3):
        for s in range(3):
            v = levels[s][chan]
            b.put(v, 5); b.put(v, 5)
    rem = 128 - len(b.bits)
    if index_bits is None:
        b.put(0, rem)
    else:
        for bit in index_bits[:rem]:
            b.bits.append(bit)
    return b.to_bytes()


def extract_p3():
    table = []
    for part in range(64):
        blk = mode2_block(part)
        out = decode_bc7_gl(blk, 4, 4).reshape(16, 4)
        row = []
        for px in out:
            v = int(px[0])
            row.append(0 if v < 60 else (1 if v < 180 else 2))
        assert row[0] == 0, (part, row)
        table.append(row)
    return table


def extract_anchors3(p3):
    """Anchors for subsets 1 and 2 in 3-subset modes (mode 2: 2-bit
    indices, anchors get 1 bit)."""
    a1, a2 = [], []
    for part in range(64):
        found = None
        for anchor1 in range(16):
            for anchor2 in range(16):
                if anchor2 == anchor1:
                    continue
                bits = []
                for t in range(16):
                    n = 1 if (t == 0 or t == anchor1 or t == anchor2) else 2
                    bits.extend([1] + [0] * (n - 1))
                blk = mode2_block(part, index_bits=bits)
                out = decode_bc7_gl(blk, 4, 4).reshape(16, 4)
                # index 1 of 2-bit: weight w2[1]=21 -> between subset levels
                # subsets: s0: 0->127 range low... compute expected per texel:
                lv = [0, 127, 255]
                def exp_val(t):
                    s = p3[part][t]
                    e0 = lv[s]; e1 = lv[s]
                    return e0  # endpoints equal per subset; index irrelevant!
                # endpoints equal makes index irrelevant; instead use
                # distinct endpoints within subsets:
                break
            else:
                continue
            break
        # fall through to direct method below
        found = _anchors3_direct(part, p3[part])
        a1.append(found[0]); a2.append(found[1])
    return a1, a2


def _anchors3_direct(part, subset_row):
    """Set per-subset endpoints distinct (e0=0, e1=max): then each texel's
    decoded value reveals its index value; feeding a known bit string and
    trying anchor candidates to match."""
    for anchor1 in range(16):
        for anchor2 in range(16):
            if anchor2 == anchor1 or anchor1 == 0 or anchor2 == 0:
                continue
            bits = []
            for t in range(16):
                n = 1 if (t == 0 or t == anchor1 or t == anchor2) else 2
                bits.extend([1] + [0] * (n - 1))
            b = Bits()
            b.put(0b100, 3)
            b.put(part, 6)
            for chan in range(3):
                for s in range(3):
                    b.put(0, 5); b.put(31, 5)
            rem = 128 - len(b.bits)
            for bit in bits[:rem]:
                b.bits.append(bit)
            blk = b.to_bytes()
            out = decode_bc7_gl(blk, 4, 4).reshape(16, 4)
            # All texels: endpoints 0..255, index value 1 (anchors store it
            # in 1 bit, the implicit MSB is 0) -> weight w2[1]=21 -> ~84.
            expect = round(21 / 64 * 255)
            ok = all(abs(int(out[t][0]) - expect) <= 3 for t in range(16))
            if ok:
                return anchor1, anchor2
    raise AssertionError(f"no anchors found for partition {part}")


def main():
    p2 = extract_p2()
    print("P2 extracted")
    a2 = extract_anchors2(p2)
    print("A2 extracted")
    p3 = extract_p3()
    print("P3 extracted")
    a3a, a3b = [], []
    for part in range(64):
        x, y = _anchors3_direct(part, p3[part])
        a3a.append(x); a3b.append(y)
    print("A3 extracted")

    out = ["// BPTC constant tables, derived by probing the Mesa llvmpipe",
           "// BPTC decoder (tools/extract_bptc_tables.py). These are the",
           "// public BC7/BC6H spec constants.",
           "#pragma once",
           "#include <stdint.h>",
           ""]
    def emit(name, rows):
        out.append(f"static const uint8_t {name}[64][16] = {{")
        for r in rows:
            out.append("  {" + ",".join(map(str, r)) + "},")
        out.append("};")
    emit("kP2", p2)
    emit("kP3", p3)
    out.append("static const uint8_t kAnchor2[64] = {" + ",".join(map(str, a2)) + "};")
    out.append("static const uint8_t kAnchor3a[64] = {" + ",".join(map(str, a3a)) + "};")
    out.append("static const uint8_t kAnchor3b[64] = {" + ",".join(map(str, a3b)) + "};")
    path = os.path.join(os.path.dirname(__file__), '..',
                        'superconductor_tpu/native/src/bptc_tables.h')
    with open(path, 'w') as f:
        f.write("\n".join(out) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
