#!/usr/bin/env python3
"""Generate src/test/resources/fixtures/media.jsonl: video container
payloads (minimal MP4/ISO-BMFF and Matroska/WebM files) synthesized
FROM the metadata fields stored in the same row. The Spark side parses
the metadata back out of the bytes alone (graft.multimodal
.VideoContainers); the DuckDB oracle recomputes it from the JSON
fields — an independent cross-language derivation, so a parser bug
cannot cancel against a generator bug written in the same code.

Deterministic output; run once and commit the fixture.
"""
import base64
import json
import struct


def box(typ: bytes, *payload: bytes) -> bytes:
    p = b"".join(payload)
    return struct.pack(">I", 8 + len(p)) + typ + p


def mp4(brand, timescale, ticks, tracks, v1=False):
    """tracks: list of (codec, w, h); w=h=0 -> non-video track."""
    if v1:
        mvhd = box(b"mvhd", b"\x01\x00\x00\x00", b"\x00" * 16,
                   struct.pack(">I", timescale), struct.pack(">Q", ticks))
    else:
        mvhd = box(b"mvhd", b"\x00" * 12,
                   struct.pack(">I", timescale), struct.pack(">I", ticks))
    traks = []
    for codec, w, h in tracks:
        tkhd = box(b"tkhd", b"\x00" * 76,
                   struct.pack(">I", w << 16), struct.pack(">I", h << 16))
        stsd = box(b"stsd", b"\x00" * 4, struct.pack(">I", 1),
                   struct.pack(">I", 16), codec.encode(), b"\x00" * 8)
        traks.append(box(b"trak", tkhd,
                         box(b"mdia", box(b"minf", box(b"stbl", stsd)))))
    return (box(b"ftyp", brand.encode(), struct.pack(">I", 512)) +
            box(b"moov", mvhd, *traks))


def ebml_size(n: int) -> bytes:
    assert n < 127
    return bytes([0x80 | n])


def el(eid: bytes, *payload: bytes) -> bytes:
    p = b"".join(payload)
    return eid + ebml_size(len(p)) + p


def mkv(doctype, scale_ns, ticks_f32, tracks):
    """tracks: list of (codec, w, h, is_video)."""
    header = el(b"\x1a\x45\xdf\xa3", el(b"\x42\x82", doctype.encode()))
    info = el(b"\x15\x49\xa9\x66",
              el(b"\x2a\xd7\xb1",
                 scale_ns.to_bytes((scale_ns.bit_length() + 7) // 8, "big")),
              el(b"\x44\x89", struct.pack(">f", ticks_f32)))
    entries = []
    for codec, w, h, is_video in tracks:
        parts = [el(b"\x83", bytes([1 if is_video else 2])),
                 el(b"\x86", codec.encode())]
        if is_video:
            parts.append(el(b"\xe0",
                            el(b"\xb0", w.to_bytes(2, "big")),
                            el(b"\xba", h.to_bytes(2, "big"))))
        entries.append(el(b"\xae", *parts))
    tracks_el = el(b"\x16\x54\xae\x6b", *entries)
    return header + el(b"\x18\x53\x80\x67", info, tracks_el)


# ---------------------------------------------------------------- JPEG
# Minimal baseline JFIF encoder for GRAYSCALE images built from flat
# 8x8 blocks. With a quantization table of all 8s, a flat block of
# value v has a single DC coefficient 8*(v-128)/8 = v-128 (all AC
# zero), which any conformant decoder reconstructs EXACTLY: the IDCT
# of a DC-only block is the flat value (v-128)*8/8 + 128 = v. So the
# decoded luma of every pixel — and hence the frame mean — is known in
# closed form on both sides of the cross-language oracle.
# Huffman tables are the ITU-T T.81 Annex K typical tables (public).

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def huff_codes(bits, vals):
    """Canonical Huffman (code, length) per value, per T.81 C.2."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


DC_HUFF = huff_codes(DC_BITS, DC_VALS)
AC_HUFF = huff_codes(AC_BITS, AC_VALS)


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def done(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.buf)


def seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload


def jpeg_gray(block_rows):
    """Grayscale baseline JPEG from a 2-D grid of flat 8x8 block
    values (block_rows[r][c] = luma 0..255). Decodes exactly."""
    bh, bw = len(block_rows), len(block_rows[0])
    h, w = bh * 8, bw * 8
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, b"\x00" + bytes([8] * 64))  # DQT: all 8s
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    bits = BitWriter()
    pred = 0
    for row in block_rows:
        for v in row:
            dc = v - 128  # quantized DC (quant step 8 divides 8*(v-128))
            diff = dc - pred
            pred = dc
            ssss = diff.bit_length() if diff > 0 else (-diff).bit_length()
            code, length = DC_HUFF[ssss]
            bits.put(code, length)
            if ssss:
                bits.put(diff if diff > 0 else diff + (1 << ssss) - 1, ssss)
            ac_code, ac_len = AC_HUFF[0x00]  # EOB: all AC zero
            bits.put(ac_code, ac_len)
    out += bits.done()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------- AVI
# RIFF/AVI (little-endian, unlike MP4/EBML): the third container
# family, and the one whose frames a zero-dependency JVM CAN decode —
# MJPEG frames are plain baseline JPEGs handled by javax.imageio.


def rchunk(fcc, data):
    pad = b"\x00" if len(data) % 2 else b""
    return fcc + struct.pack("<I", len(data)) + data + pad


def rlist(fcc, *parts):
    return rchunk(b"LIST", fcc + b"".join(parts))


def avi(us_per_frame, w, h, frames, handler=b"MJPG"):
    """frames: list of encoded JPEG byte strings (one per frame)."""
    n = len(frames)
    avih = struct.pack("<10I", us_per_frame, 0, 0, 0x10, n, 0, 1, 0, w, h)
    avih += b"\x00" * 16
    strh = b"vids" + handler + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, us_per_frame, 1000000, 0, n, 0, 10000, 0)
    strh += b"\x00" * 8  # rcFrame
    strf = struct.pack("<IiiHH", 40, w, h, 1, 24) + handler
    strf += struct.pack("<IiiII", w * h * 3, 0, 0, 0, 0)
    hdrl = rlist(b"hdrl", rchunk(b"avih", avih),
                 rlist(b"strl", rchunk(b"strh", strh), rchunk(b"strf", strf)))
    movi = rlist(b"movi", *[rchunk(b"00dc", f) for f in frames])
    return rchunk(b"RIFF", b"AVI " + hdrl + movi)


def up2(blocks):
    """2x nearest-neighbor block upscale: the same pattern rendered at
    double resolution (a 'higher-quality re-encode')."""
    return [[v for v in row for _ in (0, 1)]
            for row in blocks for _ in (0, 1)]


def cell_sums(blocks):
    """Per-frame aHash ORACLE input: the 64 cell luma SUMS of the 8x8
    average-hash grid, derived from the block PATTERN (never from
    decoding the payload — the independent cross-language derivation,
    same contract as images.jsonl's block_sums). Requires w, h in
    {8, 16, 32, 64} so every aHash cell lies fully inside one flat
    8x8 JPEG block (cell width w/8 divides the block width)."""
    bh, bw = len(blocks), len(blocks[0])
    h, w = bh * 8, bw * 8
    assert w in (8, 16, 32, 64) and h in (8, 16, 32, 64), (w, h)
    cpx = (w // 8) * (h // 8)  # pixels per aHash cell (all equal)
    out = []
    for cy in range(8):
        for cx in range(8):
            y, x = cy * h // 8, cx * w // 8  # cell origin pixel
            out.append(blocks[y // 8][x // 8] * cpx)
    return out


rows = [
    # --- MP4 family: duration_s = ticks / timescale
    dict(media_id=1, kind="mp4", doctype="isom", timescale=600,
         duration_ticks=3000, codec="avc1", width=320, height=240,
         n_tracks=1,
         payload=mp4("isom", 600, 3000, [("avc1", 320, 240)])),
    dict(media_id=2, kind="mp4", doctype="mp42", timescale=90000,
         duration_ticks=2700000, codec="hvc1", width=1920, height=1080,
         n_tracks=2,
         payload=mp4("mp42", 90000, 2700000,
                     [("hvc1", 1920, 1080), ("mp4a", 0, 0)])),
    # v1 mvhd (64-bit duration), video track listed second
    dict(media_id=3, kind="mp4", doctype="avc1", timescale=1000,
         duration_ticks=61500, codec="av01", width=640, height=360,
         n_tracks=2,
         payload=mp4("avc1", 1000, 61500,
                     [("mp4a", 0, 0), ("av01", 640, 360)], v1=True)),
    # --- Matroska family: duration_s = float32(ticks) * scale_ns / 1e9
    dict(media_id=4, kind="ebml", doctype="webm", timescale=1000000,
         duration_ticks=12345, codec="V_VP9", width=1280, height=720,
         n_tracks=1,
         payload=mkv("webm", 1000000, 12345.0,
                     [("V_VP9", 1280, 720, True)])),
    dict(media_id=5, kind="ebml", doctype="matroska", timescale=500000,
         duration_ticks=48000, codec="V_AV1", width=3840, height=2160,
         n_tracks=2,
         payload=mkv("matroska", 500000, 48000.0,
                     [("V_AV1", 3840, 2160, True),
                      ("A_OPUS", 0, 0, False)])),
    # audio-only matroska: no video track -> dims 0, codec from first
    dict(media_id=6, kind="ebml", doctype="matroska", timescale=1000000,
         duration_ticks=2500, codec="A_OPUS", width=0, height=0,
         n_tracks=1,
         payload=mkv("matroska", 1000000, 2500.0,
                     [("A_OPUS", 0, 0, False)])),
    # --- RIFF/AVI family: duration_s = total_us / 1e6; MJPEG frames
    # decode to exactly the flat-block lumas recorded in frame_lumas
    # (mean over blocks; every operand exactly representable)
    dict(media_id=9, kind="avi", doctype="avi", timescale=1000000,
         duration_ticks=120000, codec="MJPG", width=16, height=16,
         n_tracks=1, frame_lumas=[96.0, 128.0, 200.0],
         frame_cell_sums=[cell_sums([[60, 68], [124, 132]]),
                          cell_sums([[128, 128], [128, 128]]),
                          cell_sums([[200, 200], [200, 200]])],
         payload=avi(40000, 16, 16, [
             jpeg_gray([[60, 68], [124, 132]]),
             jpeg_gray([[128, 128], [128, 128]]),
             jpeg_gray([[200, 200], [200, 200]])])),
    dict(media_id=10, kind="avi", doctype="avi", timescale=1000000,
         duration_ticks=33333, codec="MJPG", width=8, height=8,
         n_tracks=1, frame_lumas=[77.0],
         frame_cell_sums=[cell_sums([[77]])],
         payload=avi(33333, 8, 8, [jpeg_gray([[77]])])),
    # multi-frame NON-UNIFORM MJPEG: checkerboard, its inversion, and
    # a gradient — frames whose aHash has structure (the uniform
    # frames above hash to 0: no cell strictly above the mean)
    dict(media_id=12, kind="avi", doctype="avi", timescale=1000000,
         duration_ticks=90000, codec="MJPG", width=16, height=16,
         n_tracks=1, frame_lumas=[105.0, 105.0, 65.0],
         frame_cell_sums=[cell_sums([[10, 200], [200, 10]]),
                          cell_sums([[200, 10], [10, 200]]),
                          cell_sums([[50, 60], [70, 80]])],
         payload=avi(30000, 16, 16, [
             jpeg_gray([[10, 200], [200, 10]]),
             jpeg_gray([[200, 10], [10, 200]]),
             jpeg_gray([[50, 60], [70, 80]])])),
    # RE-ENCODE of media 12 at 2x resolution (each 8x8 block becomes
    # a 2x2 block group): the aHash is resolution-invariant for
    # block-constant patterns, so every frame of 13 must hash
    # IDENTICALLY to its media-12 original — the property that makes
    # re-encoded duplicate videos detectable (q259)
    dict(media_id=13, kind="avi", doctype="avi", timescale=1000000,
         duration_ticks=90000, codec="MJPG", width=32, height=32,
         n_tracks=1, frame_lumas=[105.0, 105.0, 65.0],
         frame_cell_sums=[cell_sums(up2([[10, 200], [200, 10]])),
                          cell_sums(up2([[200, 10], [10, 200]])),
                          cell_sums(up2([[50, 60], [70, 80]]))],
         payload=avi(30000, 32, 32, [
             jpeg_gray(up2([[10, 200], [200, 10]])),
             jpeg_gray(up2([[200, 10], [10, 200]])),
             jpeg_gray(up2([[50, 60], [70, 80]]))])),
    # non-MJPEG AVI: container metadata parses, frames do NOT decode
    dict(media_id=11, kind="avi", doctype="avi", timescale=1000000,
         duration_ticks=100000, codec="xvid", width=32, height=24,
         n_tracks=1, frame_lumas=None,
         payload=avi(50000, 32, 24, [b"\x01\x02\x03", b"\x04\x05"],
                     handler=b"xvid")),
    # --- unparseable payloads: every metadata column must be NULL
    dict(media_id=7, kind="garbage", doctype=None, timescale=None,
         duration_ticks=None, codec=None, width=None, height=None,
         n_tracks=None, payload=b"just some text bytes, no container"),
    dict(media_id=8, kind="garbage", doctype=None, timescale=None,
         duration_ticks=None, codec=None, width=None, height=None,
         n_tracks=None,
         payload=mp4("isom", 600, 3000, [("avc1", 320, 240)])[:20]),
]

with open("src/test/resources/fixtures/media.jsonl", "w") as f:
    for r in rows:
        r["payload_b64"] = base64.b64encode(r.pop("payload")).decode()
        f.write(json.dumps(r) + "\n")
print(f"wrote {len(rows)} rows")
