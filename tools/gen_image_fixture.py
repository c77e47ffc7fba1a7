#!/usr/bin/env python3
"""Generate src/test/resources/fixtures/images.jsonl: real image
payloads (hand-rolled grayscale PNGs plus one exact flat-block JPEG
reusing gen_media_fixture.jpeg_gray) whose pixel content is BLOCK
CONSTANT on the 8x8 average-hash grid. Each row stores the per-cell
luma SUMS (block_sums, row-major, derived from the pattern formula,
never from decoding the payload) and n_px, so the DuckDB oracle can
assemble the 64-bit aHash from pure integer arithmetic while the
Spark side must recover the identical sums from the DECODED PIXELS —
an independent cross-language derivation: a decoder bug cannot cancel
against a generator bug written in the same code.

Deterministic output; run once and commit the fixture.
"""
import base64
import json
import struct
import zlib

from gen_media_fixture import jpeg_gray


def png_gray(pixels):
    """8-bit grayscale PNG from a 2-D pixel array (no gAMA/sRGB
    chunks, so decoders return the raw sample values)."""
    h, w = len(pixels), len(pixels[0])

    def chunk(typ, data):
        body = typ + data
        return (struct.pack(">I", len(data)) + body +
                struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (b"\x89PNG\r\n\x1a\n" +
            chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)) +
            chunk(b"IDAT", zlib.compress(raw, 9)) +
            chunk(b"IEND", b""))


def render(block_vals, w, h):
    """Block-constant pixel grid: pixel (x, y) gets the value of aHash
    cell (8*y//h, 8*x//w). w and h are multiples of 8, so cells are
    uniform w/8 x h/8 rectangles."""
    assert w % 8 == 0 and h % 8 == 0
    return [[block_vals[(8 * y // h) * 8 + (8 * x // w)]
             for x in range(w)] for y in range(h)]


def block_sums(block_vals, w, h):
    px = (w // 8) * (h // 8)
    return [v * px for v in block_vals]


def ahash(block_vals):
    """Reference aHash (verification only, not stored): bit i set iff
    cell mean strictly exceeds the global mean."""
    total = sum(block_vals)
    bits = 0
    for i, v in enumerate(block_vals):
        if v * 64 > total:
            bits |= 1 << (63 - i)
    return bits


def edit_at_distance(vals, d):
    """Deterministically derive a pattern at EXACT aHash hamming d
    from `vals`: swap a below-mean with an above-mean value (mean
    preserved, hamming +2) while d >= 2, then for an odd remainder
    brute-search one single-block rewrite that flips only its own bit
    (the mean shift must strand no other block across the boundary).
    Verified, not assumed."""
    base = ahash(vals)
    out = list(vals)
    lo = [i for i in range(64) if ahash(out) >> (63 - i) & 1 == 0]
    hi = [i for i in range(64) if ahash(out) >> (63 - i) & 1 == 1]
    li, hj = iter(lo), iter(hi)
    while bin(ahash(out) ^ base).count("1") + 1 < d:
        i, j = next(li), next(hj)
        cand = list(out)
        cand[i], cand[j] = cand[j], cand[i]
        if bin(ahash(cand) ^ base).count("1") == \
                bin(ahash(out) ^ base).count("1") + 2:
            out = cand
    if bin(ahash(out) ^ base).count("1") < d:
        done = False
        for i in range(64):
            if done:
                break
            for w in (255, 0):
                cand = list(out)
                cand[i] = w
                if bin(ahash(cand) ^ base).count("1") == d:
                    out, done = cand, True
                    break
        assert done, "no single-block odd edit found"
    assert bin(ahash(out) ^ base).count("1") == d
    return out


# pattern P: deterministic spread over 20..219, no value near enough
# to the mean for a single-block edit to flip unrelated bits
P = [(37 * i + 11) % 200 + 20 for i in range(64)]
Q = [(53 * i + 7) % 180 + 40 for i in range(64)]
FLAT = [128] * 64

rows = []


def add(media_id, codec, vals, w, h, payload):
    rows.append(dict(
        media_id=media_id, codec=codec, width=w, height=h,
        n_px=w * h, block_sums=block_sums(vals, w, h),
        payload_b64=base64.b64encode(payload).decode()))
    return vals


add(1, "png", P, 32, 32, png_gray(render(P, 32, 32)))
# exact hamming 2 from P (mean-preserving block swap) -> near-dup of 1
P2 = edit_at_distance(P, 2)
add(2, "png", P2, 32, 32, png_gray(render(P2, 32, 32)))
# exact hamming 1 from P -> near-dup of both 1 and 2
P3 = edit_at_distance(P, 1)
add(3, "png", P3, 32, 32, png_gray(render(P3, 32, 32)))
# inversion flips (almost) every bit -> far from everything
INV = [255 - v for v in P]
add(4, "png", INV, 32, 32, png_gray(render(INV, 32, 32)))
# second pattern at a non-square geometry
add(5, "png", Q, 64, 48, png_gray(render(Q, 64, 48)))
Q6 = edit_at_distance(Q, 3)
add(6, "png", Q6, 64, 48, png_gray(render(Q6, 64, 48)))
# SAME pattern as 1, other codec and resolution: aHash is pixel-scale
# invariant for block-constant content -> hamming(1, 7) = 0
add(7, "jpeg", P, 64, 64,
    jpeg_gray([[P[r * 8 + c] for c in range(8)] for r in range(8)]))
# flat image: no cell strictly above the mean -> hash 0
add(8, "png", FLAT, 32, 32, png_gray(render(FLAT, 32, 32)))
# undecodable payload -> NULL hash, excluded from pairing
rows.append(dict(media_id=9, codec=None, width=None, height=None,
                 n_px=None, block_sums=None,
                 payload_b64=base64.b64encode(
                     b"not an image at all, just bytes").decode()))

# verification: expected near-dup structure at maxHamming = 3
hs = {r["media_id"]: ahash([s // ((r["width"] // 8) *
                                  (r["height"] // 8))
                            for s in r["block_sums"]])
      for r in rows if r["block_sums"] is not None}
pairs = sorted((a, b, bin(hs[a] ^ hs[b]).count("1"))
               for a in hs for b in hs if a < b
               and bin(hs[a] ^ hs[b]).count("1") <= 3)
print("near-dup pairs (<=3):", pairs)
assert (1, 7, 0) in pairs and (1, 3, 1) in pairs and \
    (1, 2, 2) in pairs and (5, 6, 3) in pairs
assert all(a not in (4, 8, 9) and b not in (4, 8, 9)
           for a, b, _ in pairs)

with open("src/test/resources/fixtures/images.jsonl", "w") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")
print(f"wrote {len(rows)} rows")
