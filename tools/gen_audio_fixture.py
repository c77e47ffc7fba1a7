#!/usr/bin/env python3
"""Generate src/test/resources/fixtures/audio.jsonl: real WAV payloads
(16-bit signed and 8-bit unsigned PCM via the stdlib wave module)
whose |amplitude| is BLOCK CONSTANT on the 64-cell time grid of the
audio average-hash. Each row stores the per-cell amplitude SUMS
(cell_sums, in round(|s|*32768) integer units, derived from the
pattern formula, never from decoding the payload) and n_samples, so
the DuckDB oracle can assemble the 64-bit hash from pure integer
arithmetic while the Spark side must recover the identical sums from
the DECODED SAMPLES — an independent cross-language derivation: a
decoder bug cannot cancel against a generator bug in the same code.

Deterministic output; run once and commit the fixture.
"""
import base64
import io
import json
import wave


def wav_bytes(samples16, sampwidth):
    """PCM WAV from 16-bit amplitude units: sampwidth 2 writes them
    verbatim (signed LE); sampwidth 1 writes unsigned bytes
    128 + a//256 (so a must be a multiple of 256 for exactness)."""
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(sampwidth)
    w.setframerate(8000)
    if sampwidth == 2:
        w.writeframes(b"".join(
            int(s).to_bytes(2, "little", signed=True) for s in samples16))
    else:
        w.writeframes(bytes(128 + int(s) // 256 for s in samples16))
    w.close()
    return buf.getvalue()


def render(cell_vals, n):
    """Block-constant |amplitude| sequence: sample i gets the value of
    cell 64*i//n, sign alternating (|s| is what the hash reads). n is
    a multiple of 64, so cells are uniform n/64 runs."""
    assert n % 64 == 0
    return [cell_vals[64 * i // n] * (1 if i % 2 == 0 else -1)
            for i in range(n)]


def cell_sums(cell_vals, n, sampwidth):
    """Sums in round(|s|*32768) units: 16-bit decode recovers the raw
    amplitude a; 8-bit decode recovers (a//256)*256."""
    cnt = n // 64
    q = (lambda a: a) if sampwidth == 2 else (lambda a: (a // 256) * 256)
    return [q(v) * cnt for v in cell_vals]


def ahash(cell_vals):
    total = sum(cell_vals)
    bits = 0
    for i, v in enumerate(cell_vals):
        if v * 64 > total:
            bits |= 1 << (63 - i)
    return bits


def edit_at_distance(vals, d, rewrite=(32512, 0)):
    """Pattern at EXACT hash hamming d from `vals`: mean-preserving
    below/above-mean swaps (+2 each), then a brute-searched single-cell
    rewrite for an odd remainder. Verified, not assumed."""
    base = ahash(vals)
    out = list(vals)
    lo = [i for i in range(64) if base >> (63 - i) & 1 == 0]
    hi = [i for i in range(64) if base >> (63 - i) & 1 == 1]
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
            for w in rewrite:
                cand = list(out)
                cand[i] = w
                if bin(ahash(cand) ^ base).count("1") == d:
                    out, done = cand, True
                    break
        assert done, "no single-cell odd edit found"
    assert bin(ahash(out) ^ base).count("1") == d
    return out


# base pattern: multiples of 256 (8-bit quantization exact), spread
# 2048..29,696 so no cell sits near the mean boundary
A = [(((37 * i + 11) % 100) + 8) * 256 for i in range(64)]
B = [(((53 * i + 7) % 90) + 16) * 256 for i in range(64)]
FLAT = [8192] * 64

rows = []


def add(media_id, codec, vals, n, sampwidth):
    rows.append(dict(
        media_id=media_id, codec=codec, n_samples=n,
        cell_sums=cell_sums(vals, n, sampwidth),
        payload_b64=base64.b64encode(
            wav_bytes(render(vals, n), sampwidth)).decode()))


add(1, "wav16", A, 6400, 2)
# SAME pattern, twice the length: hash is duration-scale invariant
add(2, "wav16", A, 12800, 2)
# SAME pattern through the 8-bit unsigned decode path (values are
# multiples of 256, so quantization is exact): bit-depth invariance
add(3, "wav8", A, 6400, 1)
A4 = edit_at_distance(A, 1)
add(4, "wav16", A4, 6400, 2)
A5 = edit_at_distance(A, 2)
add(5, "wav16", A5, 6400, 2)
# second pattern at a different cell width
add(6, "wav16", B, 9600, 2)
B7 = edit_at_distance(B, 3)
add(7, "wav16", B7, 9600, 2)
# inversion: far from everything
add(8, "wav16", [29696 + 2048 - v for v in A], 6400, 2)
# flat |amplitude|: no cell strictly above the mean -> hash 0
add(9, "wav16", FLAT, 6400, 2)
# undecodable payload -> NULL hash, excluded from pairing
rows.append(dict(media_id=10, codec=None, n_samples=None,
                 cell_sums=None,
                 payload_b64=base64.b64encode(
                     b"definitely not audio bytes").decode()))

# verification: expected near-dup structure at maxHamming = 3
hs = {r["media_id"]: ahash([s // (r["n_samples"] // 64)
                            for s in r["cell_sums"]])
      for r in rows if r["cell_sums"] is not None}
pairs = sorted((a, b, bin(hs[a] ^ hs[b]).count("1"))
               for a in hs for b in hs if a < b
               and bin(hs[a] ^ hs[b]).count("1") <= 3)
print("near-dup pairs (<=3):", pairs)
assert (1, 2, 0) in pairs and (1, 3, 0) in pairs and \
    (1, 4, 1) in pairs and (1, 5, 2) in pairs and (6, 7, 3) in pairs
assert all(a not in (8, 9, 10) and b not in (8, 9, 10)
           for a, b, _ in pairs)

with open("src/test/resources/fixtures/audio.jsonl", "w") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")
print(f"wrote {len(rows)} rows")
