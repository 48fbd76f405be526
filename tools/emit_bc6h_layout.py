#!/usr/bin/env python3
"""Fully extract BC6H (UF16) mode layouts from the Mesa oracle and emit
superconductor_tpu/native/src/bc6h_layout.h.

Field model per mode (matches the BC6H spec structure):
  2-region: base e0 (rw/gw/bw) + three per-channel fields rx/ry/rz
            (region0.e1, region1.e0, region1.e1 — deltas when the mode is
            transformed), 5 partition bits, 46 index bits at 82..127.
  1-region: base e0 + e1 (delta or raw), 63 index bits at 65..127.
All field bit positions ordered lsb->msb; partition bits ordered by value.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from superconductor_tpu.native.gldecode import decode_bc6h_gl

MODES = [
    (0b00, 2), (0b01, 2),
    (0b00010, 5), (0b00110, 5), (0b01010, 5), (0b01110, 5),
    (0b10010, 5), (0b10110, 5), (0b11010, 5), (0b11110, 5),
    (0b00011, 5), (0b00111, 5), (0b01011, 5), (0b01111, 5),
]
ONE_REGION = {0b00011, 0b00111, 0b01011, 0b01111}


def make_block(mode, mode_bits, payload, index_val=0):
    bits = [0] * 128
    for i in range(mode_bits):
        bits[i] = (mode >> i) & 1
    for pos, v in payload.items():
        bits[pos] = v
    idx_start = 65 if mode in ONE_REGION else 82
    for pos in range(idx_start, 128):
        bits[pos] = index_val & 1
    out = bytearray(16)
    for i, b in enumerate(bits):
        out[i // 8] |= b << (i % 8)
    return bytes(out)


def dec(block):
    return decode_bc6h_gl(block, 4, 4)[..., :3].reshape(16, 3)


def p2_tables():
    # reuse the BC7-extracted P2 (same table per spec); parse the header.
    path = os.path.join(
        os.path.dirname(__file__), "..",
        "superconductor_tpu/native/src/bptc_tables.h",
    )
    rows = []
    with open(path) as f:
        in_p2 = False
        for line in f:
            if "kP2" in line:
                in_p2 = True
                continue
            if in_p2:
                line = line.strip()
                if line.startswith("};"):
                    break
                row = [int(x) for x in line.strip("{},").split(",")]
                rows.append(row)
    assert len(rows) == 64
    return rows


def extract_mode(mode, mode_bits, p2):
    one_region = mode in ONE_REGION
    idx_start = 65 if one_region else 82
    payload_range = list(range(mode_bits, idx_start))

    base0 = dec(make_block(mode, mode_bits, {}, 0))
    base1 = dec(make_block(mode, mode_bits, {}, 1))

    info = []  # (bit, chan, c0, c1, footprint, mag)
    part_bits = []
    for bit in payload_range:
        d0 = dec(make_block(mode, mode_bits, {bit: 1}, 0)) - base0
        d1 = dec(make_block(mode, mode_bits, {bit: 1}, 1)) - base1
        if np.abs(d0).max() == 0 and np.abs(d1).max() == 0:
            part_bits.append(bit)
            continue
        eff = np.abs(d0) + np.abs(d1)
        chan = int(np.argmax(eff.max(axis=0)))
        fp = frozenset(np.where((np.abs(d0[:, chan]) + np.abs(d1[:, chan])) > 0)[0].tolist())
        info.append(
            (
                bit,
                chan,
                bool(np.abs(d0[:, chan]).max() > 0),
                bool(np.abs(d1[:, chan]).max() > 0),
                fp,
                float(max(np.abs(d0[:, chan]).max(), np.abs(d1[:, chan]).max())),
            )
        )

    fields = {}
    if one_region:
        # Bits whose lone effect is quantized away by the *31/64 output
        # step (values 1-2 in a 16-bit field) show as "inert"; they are the
        # LSBs of the field starting right after them in the stream.
        inert = list(part_bits)
        part_bits = []
        for chan in range(3):
            cbits = [x for x in info if x[1] == chan]
            e0 = [x for x in cbits if x[2]]  # changes idx0 -> base e0
            e1 = [x for x in cbits if not x[2]]  # only idx1 -> e1/delta
            f0 = [b for b, *_ in sorted(e0, key=lambda x: x[5])]
            f1 = [b for b, *_ in sorted(e1, key=lambda x: x[5])]
            for f in (f0, f1):
                lead = []
                while f and (f[0] - 1 in inert or f[0] - 2 in inert):
                    for cand in (f[0] - 2, f[0] - 1):
                        if cand in inert:
                            lead.append(cand)
                            inert.remove(cand)
                    f[:0] = sorted(lead)
                    break
            fields[(chan, 0)] = f0
            fields[(chan, 1)] = f1
        assert not inert, (mode, inert)
    else:
        # region sets under partition 0
        r0 = frozenset(t for t in range(16) if p2[0][t] == 0)
        r1 = frozenset(t for t in range(16) if p2[0][t] == 1)
        for chan in range(3):
            cbits = [x for x in info if x[1] == chan]
            base, rx, ry, rz = [], [], [], []
            for x in cbits:
                bit, _, c0, c1, fp, mag = x
                if fp & r0 and fp & r1:
                    base.append(x)  # transformed: moves every endpoint
                elif fp <= r0:
                    # region-0-only: e0 bits also move the idx0 probe; e1
                    # bits only show at idx1 (untransformed mode 0b11110
                    # stores raw e0 here instead of a shared base).
                    (base if c0 else rx).append(x)
                elif c0:
                    ry.append(x)
                else:
                    rz.append(x)
            fields[(chan, 0)] = [b for b, *_ in sorted(base, key=lambda x: x[5])]
            fields[(chan, 1)] = [b for b, *_ in sorted(rx, key=lambda x: x[5])]
            fields[(chan, 2)] = [b for b, *_ in sorted(ry, key=lambda x: x[5])]
            fields[(chan, 3)] = [b for b, *_ in sorted(rz, key=lambda x: x[5])]

    # transformed? set the base/e0 msb, deltas 0: if the idx1 output of a
    # region-0 non-anchor texel follows it, e1 = e0 + 0 (transformed).
    bits_e0 = fields[(0, 0)]
    payload = {bits_e0[-1]: 1}
    probe_texel = 1  # texel 1 is region 0 non-anchor under partition 0
    v0 = dec(make_block(mode, mode_bits, payload, 0))[probe_texel, 0]
    v1 = dec(make_block(mode, mode_bits, payload, 1))[probe_texel, 0]
    transformed = v0 > 0 and abs(v1 - v0) < 1e-9

    # partition bit order: make region1 visible via ry (big delta), then
    # flip each partition bit and match the pattern to kP2 rows.
    part_order = [None] * len(part_bits)
    if not one_region:
        ry_bits = fields[(0, 2)]
        vis = {ry_bits[-1]: 1}  # biggest ry bit -> regions differ at idx0
        for pb in part_bits:
            out = dec(make_block(mode, mode_bits, {**vis, pb: 1}, 0))
            patt = tuple(1 if v > 0 else 0 for v in out[:, 0])
            # find which power-of-two partition this is
            matches = [
                k for k in range(6)
                if (1 << k) < 64 and tuple(p2[1 << k]) == patt
            ]
            assert len(matches) == 1, (mode, pb, patt, matches)
            part_order[matches[0]] = pb
        part_order = [b for b in part_order if b is not None]
        assert len(part_order) == len(part_bits)

    widths = {k: len(v) for k, v in fields.items()}
    return {
        "mode": mode,
        "mode_bits": mode_bits,
        "one_region": one_region,
        "transformed": transformed,
        "fields": fields,
        "part_bits": part_order,
        "epb": widths[(0, 0)],
    }


def main():
    p2 = p2_tables()
    layouts = [extract_mode(m, mb, p2) for m, mb in MODES]
    for L in layouts:
        print(
            f"mode {L['mode']:#07b}: epb={L['epb']} 1reg={L['one_region']} "
            f"xform={L['transformed']} widths="
            + str({k: len(v) for k, v in sorted(L['fields'].items())})
        )

    out = [
        "// BC6H (UF16) mode layouts, derived by probing the Mesa BPTC",
        "// decoder (tools/emit_bc6h_layout.py). Public spec constants.",
        "#pragma once",
        "#include <stdint.h>",
        "",
        "struct Bc6hField { uint8_t count; uint8_t bits[20]; };",
        "struct Bc6hMode {",
        "  uint8_t prefix, prefix_len, one_region, transformed, epb;",
        "  Bc6hField fields[12];  // (chan r/g/b) x (e0, e1, e2, e3)",
        "  uint8_t part_bits[5];",
        "};",
        "",
        f"static const int kNumBc6hModes = {len(layouts)};",
        "static const Bc6hMode kBc6hModes[] = {",
    ]
    for L in layouts:
        rows = []
        for chan in range(3):
            for e in range(4):
                bits = L["fields"].get((chan, e), [])
                rows.append(
                    "{%d,{%s}}" % (len(bits), ",".join(map(str, bits)) or "0")
                )
        pb = L["part_bits"] + [0] * (5 - len(L["part_bits"]))
        out.append(
            "  {%d, %d, %d, %d, %d, {%s}, {%s}},"
            % (
                L["mode"],
                L["mode_bits"],
                int(L["one_region"]),
                int(L["transformed"]),
                L["epb"],
                ",".join(rows),
                ",".join(map(str, pb)),
            )
        )
    out.append("};")
    path = os.path.join(
        os.path.dirname(__file__), "..",
        "superconductor_tpu/native/src/bc6h_layout.h",
    )
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
