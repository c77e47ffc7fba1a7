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
