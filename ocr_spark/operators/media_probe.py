"""Container probes: real metadata parsing for media the pipeline cannot
(or should not) fully decode.

At 100-TB crawl scale the first thing a pipeline does with an audio/video
payload is NOT decode it — it's read the container header to decide
whether to keep it at all (duration caps, codec allowlists, bitrate
floors, resolution filters). This module implements those header walks
for real, from the public specs, with decode itself left to the real
codecs (`audio_codecs`, `flac_codec`) where we have them and explicitly
stubbed where we don't (mp3/ogg/aac payload decode, mp4 video frames):

  mp3_probe  — ID3v2 skip (syncsafe size + footer flag), MPEG frame-header
               walk across versions 1/2/2.5 × layers I/II/III (full
               bitrate/sample-rate tables, padding, frame-size formulas),
               Xing/Info and VBRI VBR headers, resync-on-garbage; emits
               n_frames, duration, average bitrate, VBR flag, channels.
  ogg_probe  — page walk ("OggS", lacing segments, granule positions, page
               CRC-32 poly 0x04C11DB7 verified), codec identification from
               the BOS page (Vorbis ident header: channels + rate + nominal
               bitrate; OpusHead: channels + pre-skip, granules at 48 kHz;
               Theora marker), duration from the stream's last granule.
  mp4_probe  — ISO-BMFF box walk (32/64-bit sizes), ftyp brand, mvhd
               movie duration, per-trak mdhd/hdlr/stsd (handler, sample-
               entry fourcc, track duration), tkhd 16.16 display size;
               avcC/hvcC decoder-config records parsed for the AVC/HEVC
               SPS coded size + profile/level (exp-Golomb, no decoder),
               the fallback when tkhd is 0x0.
  mp4_sample_index / video_frame_index (multimodal) — stbl sample tables
               expanded to per-frame byte ranges: frame sampling and
               keyframe payload extraction WITHOUT a codec.
  flac_probe / wav_probe — header-only duration/rate/channels (no decode;
               the real decoders live in flac_codec / audio_codecs).

`media_probe(assets)` is the Spark surface: one mapInPandas stage over
(media_ref, content) that sniffs the container and emits a typed row per
asset with a per-asset error envelope — the same contract as
image_features/audio_features. Fixture synthesizers (`synth_mp3`,
`synth_ogg`, `synth_mp4`) build valid streams so the probes are
golden-testable without third-party media.

Reference parity: the reference's media surface is PIL image loading plus
a spec doc (`OCR-X_Component_Breakdown_OptionB.md:11-18` lists the
acquisition formats); the probe fields follow the public MPEG-1/2 audio,
Ogg (RFC 3533), Vorbis I, Opus (RFC 7845) and ISO BMFF (14496-12) specs.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 audio frame headers)
# ---------------------------------------------------------------------------

# bitrate tables in kbps, index 1..14 (0 = free, 15 = bad)
_BR_V1_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]
_BR_V1_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]
_BR_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BR_V2_L1 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256]
_BR_V2_L23 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]

_SR_BY_VERSION = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _mp3_frame_info(hdr: int) -> dict | None:
    """Parse a 32-bit MPEG audio frame header; None if invalid."""
    if (hdr >> 21) & 0x7FF != 0x7FF:
        return None
    version = (hdr >> 19) & 3  # 0=2.5, 1=reserved, 2=V2, 3=V1
    layer = (hdr >> 17) & 3  # 1=III, 2=II, 3=I
    br_idx = (hdr >> 12) & 0xF
    sr_idx = (hdr >> 10) & 3
    padding = (hdr >> 9) & 1
    mode = (hdr >> 6) & 3  # 3 = mono
    if version == 1 or layer == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    sample_rate = _SR_BY_VERSION[version][sr_idx]
    if version == 3:  # MPEG-1
        table = {3: _BR_V1_L1, 2: _BR_V1_L2, 1: _BR_V1_L3}[layer]
    else:  # MPEG-2 / 2.5
        table = _BR_V2_L1 if layer == 3 else _BR_V2_L23
    bitrate = table[br_idx] * 1000
    if layer == 3:  # Layer I
        frame_size = (12 * bitrate // sample_rate + padding) * 4
        samples = 384
    elif layer == 2:  # Layer II
        frame_size = 144 * bitrate // sample_rate + padding
        samples = 1152
    else:  # Layer III
        if version == 3:
            frame_size = 144 * bitrate // sample_rate + padding
            samples = 1152
        else:
            frame_size = 72 * bitrate // sample_rate + padding
            samples = 576
    return {
        "version": {3: "1", 2: "2", 0: "2.5"}[version],
        "layer": {3: 1, 2: 2, 1: 3}[layer],
        "sample_rate": sample_rate,
        "bitrate": bitrate,
        "frame_size": frame_size,
        "samples": samples,
        "n_channels": 1 if mode == 3 else 2,
        "mono": mode == 3,
        # protection_bit == 0 means a 2-byte CRC-16 sits between the header
        # and the side info — it shifts the Xing/Info offset
        "crc": not ((hdr >> 16) & 1),
    }


def _skip_id3v2(content: bytes) -> int:
    if content[:3] != b"ID3" or len(content) < 10:
        return 0
    flags = content[5]
    size = 0
    for b in content[6:10]:
        if b & 0x80:
            return 0  # not syncsafe -> not a real ID3 header
        size = (size << 7) | b
    return 10 + size + (10 if flags & 0x10 else 0)


def mp3_probe(content: bytes, max_resync: int = 1 << 16) -> dict:
    """Walk every MPEG audio frame; return container metadata.

    Tolerates leading ID3v2 and up to `max_resync` bytes of junk between
    frames (real crawls truncate and glue streams). Reads the Xing/Info or
    VBRI header of the first frame when present (authoritative VBR frame
    count). Raises ValueError if no valid frame exists.
    """
    pos = _skip_id3v2(content)
    payload_start = pos
    n = len(content)
    n_frames = 0
    walked = 0  # frames actually seen (≠ n_frames when a VBR header counts)
    total_samples = 0
    bitrate_sum = 0
    first: dict | None = None
    vbr_frames = vbr_bytes = vbr_tag = None
    junk = 0
    while pos + 4 <= n:
        info = _mp3_frame_info(int.from_bytes(content[pos : pos + 4], "big"))
        if info is None or info["frame_size"] < 4:
            pos += 1
            junk += 1
            if junk > max_resync:
                break
            continue
        junk = 0
        if first is None:
            first = info
            vbr_frames, vbr_bytes, vbr_tag = _read_vbr_header(content, pos, info)
            if vbr_frames is not None:
                # the header frame count is authoritative — stop the
                # O(file-size) walk; the probe's job is a cheap pre-decode
                # header check, and every derived field below comes from
                # the header (not the discarded walk)
                break
        n_frames += 1
        walked += 1
        total_samples += info["samples"]
        bitrate_sum += info["bitrate"]
        pos += info["frame_size"]
    if first is None:
        raise ValueError("no valid MPEG audio frame found")
    if vbr_frames is not None:
        total_samples = vbr_frames * first["samples"]
        n_frames = vbr_frames
    duration = total_samples / first["sample_rate"]
    if vbr_frames is not None:
        # average over the header's own byte count when present; falling
        # back to the walked-frame average would divide bytes seen by the
        # CLAIMED frame count and understate truncated payloads
        stream_bytes = (
            vbr_bytes if vbr_bytes is not None else n - payload_start
        )
        avg_kbps = (stream_bytes * 8 / duration / 1000.0) if duration else None
    else:
        avg_kbps = (bitrate_sum / walked / 1000.0) if walked else None
    # 'Info' is LAME's explicit CBR marker — same layout as Xing, opposite
    # meaning; only Xing/VBRI (or observed bitrate variance) imply VBR
    vbr = vbr_tag in ("Xing", "VBRI") or (
        walked > 1 and bitrate_sum != walked * first["bitrate"]
    )
    return {
        "container": "mp3",
        "codec": f"mpeg{first['version']}-layer{first['layer']}",
        "sample_rate": first["sample_rate"],
        "n_channels": first["n_channels"],
        "n_frames": n_frames,
        "duration_sec": duration,
        "bitrate_kbps": avg_kbps,
        "vbr": bool(vbr),
    }


def _read_vbr_header(
    content: bytes, frame_pos: int, info: dict
) -> tuple[int | None, int | None, str | None]:
    """(frame_count, byte_count, tag) from a Xing/Info header (at the
    side-info offset, shifted +2 when the frame carries a CRC-16) or a
    VBRI header (fixed +32 after the side info start); (None, None, None)
    when absent."""
    crc = 2 if info["crc"] else 0
    if info["layer"] == 3:  # only Layer III carries side info
        if info["version"] == "1":
            off = 17 if info["mono"] else 32
        else:
            off = 9 if info["mono"] else 17
        p = frame_pos + 4 + crc + off
        tag = content[p : p + 4]
        if tag in (b"Xing", b"Info") and len(content) >= p + 8:
            flags = int.from_bytes(content[p + 4 : p + 8], "big")
            q = p + 8
            frames = nbytes = None
            if flags & 1 and len(content) >= q + 4:
                frames = int.from_bytes(content[q : q + 4], "big")
                q += 4
            if flags & 2 and len(content) >= q + 4:
                nbytes = int.from_bytes(content[q : q + 4], "big")
            if frames is not None:
                return frames, nbytes, tag.decode()
    p = frame_pos + 4 + crc + 32
    if content[p : p + 4] == b"VBRI" and len(content) >= p + 18:
        return (
            int.from_bytes(content[p + 14 : p + 18], "big"),
            int.from_bytes(content[p + 10 : p + 14], "big"),
            "VBRI",
        )
    return None, None, None


def synth_mp3(
    n_frames: int = 10,
    version: str = "1",
    layer: int = 3,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    id3: bytes | None = None,
    xing: bool = False,
    tag: str | None = None,
    with_bytes: bool = False,
    protect: bool = False,
) -> bytes:
    """Build a valid MPEG audio stream (zero payload) for probe fixtures.

    tag: 'Xing' (VBR marker), 'Info' (LAME's CBR marker) or None; xing=True
    is shorthand for tag='Xing'. with_bytes adds the BYTES field to the
    header. protect=True clears the protection bit (a 2-byte CRC-16 sits
    between the header and the side info, shifting the tag offset)."""
    if xing and tag is None:
        tag = "Xing"
    ver_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    layer_bits = {1: 3, 2: 2, 3: 1}[layer]
    if ver_bits == 3:
        table = {1: _BR_V1_L1, 2: _BR_V1_L2, 3: _BR_V1_L3}[layer]
    else:
        table = _BR_V2_L1 if layer == 1 else _BR_V2_L23
    br_idx = table.index(bitrate_kbps)
    sr_idx = _SR_BY_VERSION[ver_bits].index(sample_rate)
    mode = 3 if mono else 0
    hdr = (
        (0x7FF << 21) | (ver_bits << 19) | (layer_bits << 17)
        | ((0 if protect else 1) << 16)
        | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
    )
    info = _mp3_frame_info(hdr)
    assert info is not None
    frame = bytearray(hdr.to_bytes(4, "big")) + b"\x00" * (info["frame_size"] - 4)
    out = bytearray()
    if id3 is not None:
        body = id3
        size = len(body)
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + body
    if tag is not None:
        f0 = bytearray(frame)
        off = (17 if mono else 32) if version == "1" else (9 if mono else 17)
        p = 4 + (2 if protect else 0) + off
        f0[p : p + 4] = tag.encode()
        flags = 1 | (2 if with_bytes else 0)  # FRAMES (+ BYTES)
        f0[p + 4 : p + 8] = flags.to_bytes(4, "big")
        f0[p + 8 : p + 12] = n_frames.to_bytes(4, "big")
        if with_bytes:
            total = len(frame) * n_frames
            f0[p + 12 : p + 16] = total.to_bytes(4, "big")
        out += f0
        out += frame * (n_frames - 1)
    else:
        out += frame * n_frames
    return bytes(out)


# ---------------------------------------------------------------------------
# Ogg (RFC 3533) + Vorbis I / Opus (RFC 7845) identification
# ---------------------------------------------------------------------------


def _make_ogg_crc_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    for byte in range(256):
        crc = byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
        table[byte] = crc
    return table


_OGG_CRC_TABLE = _make_ogg_crc_table()


def ogg_crc(data: bytes) -> int:
    crc = 0
    tab = _OGG_CRC_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ int(tab[((crc >> 24) ^ b) & 0xFF])
    return crc


def ogg_probe(content: bytes, verify_crc: bool = True) -> dict:
    """Walk Ogg pages; identify the codec from the BOS packet and derive
    duration from the last granule position of the first audio stream."""
    pos, n = 0, len(content)
    codec = None
    sample_rate = None
    n_channels = None
    bitrate_kbps = None
    pre_skip = 0
    serial_of_interest = None
    last_granule = None
    n_pages = 0
    while pos + 27 <= n:
        if content[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg capture pattern at byte {pos}")
        (granule,) = struct.unpack_from("<q", content, pos + 6)
        (serial,) = struct.unpack_from("<I", content, pos + 14)
        (crc_given,) = struct.unpack_from("<I", content, pos + 22)
        nsegs = content[pos + 26]
        seg_table = content[pos + 27 : pos + 27 + nsegs]
        body_len = sum(seg_table)
        page_end = pos + 27 + nsegs + body_len
        if page_end > n:
            raise ValueError("truncated Ogg page")
        if verify_crc:
            page = bytearray(content[pos:page_end])
            page[22:26] = b"\x00\x00\x00\x00"
            if ogg_crc(bytes(page)) != crc_given:
                raise ValueError(f"Ogg page CRC mismatch at byte {pos}")
        header_type = content[pos + 5]
        body = content[pos + 27 + nsegs : page_end]
        if header_type & 0x02 and codec is None:  # BOS
            if body[:7] == b"\x01vorbis" and len(body) >= 28:
                codec = "vorbis"
                n_channels = body[11]
                (sample_rate,) = struct.unpack_from("<I", body, 12)
                (nominal,) = struct.unpack_from("<i", body, 20)
                bitrate_kbps = nominal / 1000.0 if nominal > 0 else None
                serial_of_interest = serial
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                n_channels = body[9]
                (pre_skip,) = struct.unpack_from("<H", body, 10)
                sample_rate = 48000  # Opus granules are always 48 kHz
                serial_of_interest = serial
            elif body[:7] == b"\x80theora":
                codec = "theora"
        if serial == serial_of_interest and granule >= 0:
            last_granule = granule
        n_pages += 1
        pos = page_end
    if n_pages == 0:
        raise ValueError("no Ogg pages found")
    duration = None
    if last_granule is not None and sample_rate:
        samples = last_granule - (pre_skip if codec == "opus" else 0)
        duration = max(0, samples) / sample_rate
    return {
        "container": "ogg",
        "codec": codec,
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_frames": n_pages,
        "duration_sec": duration,
        "bitrate_kbps": bitrate_kbps,
        "vbr": None,
    }


def _ogg_page(
    body: bytes, serial: int, seq: int, granule: int, header_type: int
) -> bytes:
    segs = []
    rest = body
    while True:
        segs.append(min(255, len(rest)))
        if len(rest) < 255:
            break
        rest = rest[255:]
    hdr = (
        b"OggS\x00"
        + bytes([header_type])
        + struct.pack("<qII", granule, serial, seq)
        + b"\x00\x00\x00\x00"
        + bytes([len(segs)])
        + bytes(segs)
    )
    page = bytearray(hdr + body)
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def synth_ogg(
    codec: str = "vorbis",
    sample_rate: int = 44100,
    n_channels: int = 2,
    total_samples: int = 44100 * 3,
    nominal_bitrate: int = 112000,
    pre_skip: int = 312,
    serial: int = 0x1234,
) -> bytes:
    """Build a minimal valid Ogg stream (ident BOS page + one data page
    carrying the final granule) for probe fixtures."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<IB", 0, n_channels)
            + struct.pack("<iiii", sample_rate, -1, nominal_bitrate, -1)
            + b"\xb8\x01"
        )
        granule_end = total_samples
    elif codec == "opus":
        ident = (
            b"OpusHead\x01"
            + bytes([n_channels])
            + struct.pack("<HIhB", pre_skip, sample_rate, 0, 0)
        )
        granule_end = total_samples + pre_skip
    else:
        raise ValueError(f"unknown synth codec {codec!r}")
    p0 = _ogg_page(ident, serial, 0, 0, 0x02)
    p1 = _ogg_page(b"\x00" * 64, serial, 1, granule_end, 0x04)
    return p0 + p1


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF (ISO 14496-12)
# ---------------------------------------------------------------------------


def _walk_boxes(data: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated 64-bit box header")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"invalid box size {size} for {btype!r}")
        yield btype, body, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, btype: bytes) -> tuple[int, int] | None:
    for t, b, e in _walk_boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def mp4_probe(content: bytes) -> dict:
    """ISO-BMFF box walk: brand, movie duration, per-track handler/codec/
    duration, display width/height. Raises ValueError for non-BMFF data."""
    n = len(content)
    if n < 8 or content[4:8] not in (b"ftyp", b"moov", b"styp"):
        raise ValueError("not an ISO-BMFF payload")
    brand = None
    duration = None
    width = height = None
    tracks: list[dict] = []
    for btype, b, e in _walk_boxes(content, 0, n):
        if btype == b"ftyp" and e - b >= 4:
            brand = content[b : b + 4].decode("latin-1").strip()
        elif btype == b"moov":
            mvhd = _find_box(content, b, e, b"mvhd")
            if mvhd:
                mb, _ = mvhd
                ver = content[mb]
                if ver == 1:
                    (ts,) = struct.unpack_from(">I", content, mb + 20)
                    (dur,) = struct.unpack_from(">Q", content, mb + 24)
                else:
                    (ts,) = struct.unpack_from(">I", content, mb + 12)
                    (dur,) = struct.unpack_from(">I", content, mb + 16)
                if ts:
                    duration = dur / ts
            for t2, b2, e2 in _walk_boxes(content, b, e):
                if t2 != b"trak":
                    continue
                trk: dict = {"handler": None, "codec": None, "duration_sec": None}
                tkhd = _find_box(content, b2, e2, b"tkhd")
                if tkhd:
                    tb, te = tkhd
                    if te - tb >= 8:
                        (w16,) = struct.unpack_from(">I", content, te - 8)
                        (h16,) = struct.unpack_from(">I", content, te - 4)
                        if w16 and h16:
                            width, height = w16 >> 16, h16 >> 16
                mdia = _find_box(content, b2, e2, b"mdia")
                if mdia:
                    mb2, me2 = mdia
                    mdhd = _find_box(content, mb2, me2, b"mdhd")
                    if mdhd:
                        hb, _ = mdhd
                        ver = content[hb]
                        if ver == 1:
                            (ts2,) = struct.unpack_from(">I", content, hb + 20)
                            (dur2,) = struct.unpack_from(">Q", content, hb + 24)
                        else:
                            (ts2,) = struct.unpack_from(">I", content, hb + 12)
                            (dur2,) = struct.unpack_from(">I", content, hb + 16)
                        if ts2:
                            trk["duration_sec"] = dur2 / ts2
                    hdlr = _find_box(content, mb2, me2, b"hdlr")
                    if hdlr:
                        hb2, _ = hdlr
                        trk["handler"] = content[hb2 + 8 : hb2 + 12].decode("latin-1")
                    minf = _find_box(content, mb2, me2, b"minf")
                    if minf:
                        stbl = _find_box(content, *minf, b"stbl")
                        if stbl:
                            stsd = _find_box(content, *stbl, b"stsd")
                            if stsd:
                                sb, se = stsd
                                if se - sb >= 16:
                                    trk["codec"] = content[sb + 12 : sb + 16].decode(
                                        "latin-1"
                                    )
                                # avc1/avc3 (hvc1/hev1) sample entries carry
                                # an avcC (hvcC) record; its SPS states the
                                # CODED size
                                _cfg = {
                                    "avc1": (b"avcC", avcc_parse, "avc"),
                                    "avc3": (b"avcC", avcc_parse, "avc"),
                                    "hvc1": (b"hvcC", hvcc_parse, "hevc"),
                                    "hev1": (b"hvcC", hvcc_parse, "hevc"),
                                }.get(trk["codec"])
                                if _cfg:
                                    btype2, parse, key = _cfg
                                    es = sb + 8  # first sample entry
                                    (esz,) = struct.unpack_from(">I", content, es)
                                    kids = es + 86  # after VisualSampleEntry
                                    if kids < es + esz <= se:
                                        cfg_box = _find_box(
                                            content, kids, es + esz, btype2
                                        )
                                        if cfg_box:
                                            try:
                                                trk[key] = parse(
                                                    content[cfg_box[0] : cfg_box[1]]
                                                )
                                            except ValueError:
                                                pass
                            stsz = _find_box(content, *stbl, b"stsz")
                            if stsz and stsz[1] - stsz[0] >= 12:
                                (trk["n_samples"],) = struct.unpack_from(
                                    ">I", content, stsz[0] + 8
                                )
                tracks.append(trk)
    vid = next((t for t in tracks if t["handler"] == "vide"), None)
    aud = next((t for t in tracks if t["handler"] == "soun"), None)
    codec = (vid or aud or {"codec": None})["codec"]
    sps = (vid or {}).get("avc") or (vid or {}).get("hevc")
    if sps and not (width and height):
        # tkhd display size absent/zero: the SPS coded size is authoritative
        width, height = sps["width"], sps["height"]
    return {
        "container": "mp4",
        "brand": brand,
        "codec": codec,
        "duration_sec": duration,
        "n_frames": (vid or {}).get("n_samples"),
        "n_tracks": len(tracks),
        "tracks": tracks,
        "width": width,
        "height": height,
    }


def _full_box_body(data: bytes, b: int, e: int, name: str) -> tuple[int, int]:
    """Skip a full box's version+flags word; return (payload_start, end)."""
    if e - b < 4:
        raise ValueError(f"{name}: truncated full-box header")
    return b + 4, e


def _u32s(data: bytes, start: int, count: int, end: int, name: str) -> np.ndarray:
    if start + 4 * count > end:
        raise ValueError(f"{name}: table truncated ({count} entries)")
    return np.frombuffer(data, dtype=">u4", count=count, offset=start).astype(
        np.int64
    )


def mp4_sample_index(content: bytes, handler: str = "vide") -> dict:
    """Per-sample (frame) index from the ISO-BMFF sample tables — the
    100-TB video path: a frame sampler never decodes the stream, it reads
    `stbl` and extracts keyframe byte ranges straight out of `mdat`.

    Walks the first trak whose `hdlr` matches `handler` and expands the
    five sample tables (ISO 14496-12 §8.6-8.7):

      stts  decode deltas        → per-sample decode time (via mdhd timescale)
      stsz  sample sizes         (constant-size and per-sample forms)
      stsc  sample→chunk mapping (run-length rows expanded over stco)
      stco / co64                chunk byte offsets (32/64-bit)
      stss  sync-sample numbers  (absent ⇒ every sample is a keyframe, per spec)

    Returns {"codec", "timescale", "n", "time_sec", "offset", "size",
    "keyframe"} with numpy arrays of length n. Raises ValueError for a
    missing track/table or an inconsistent table (the per-asset error
    envelope upstream turns that into a row, not a dead batch)."""
    n_total = len(content)
    if n_total < 8 or content[4:8] not in (b"ftyp", b"moov", b"styp"):
        raise ValueError("not an ISO-BMFF payload")
    want = handler.encode("latin-1") if isinstance(handler, str) else handler
    for btype, b, e in _walk_boxes(content, 0, n_total):
        if btype != b"moov":
            continue
        for t2, b2, e2 in _walk_boxes(content, b, e):
            if t2 != b"trak":
                continue
            mdia = _find_box(content, b2, e2, b"mdia")
            if not mdia:
                continue
            hdlr = _find_box(content, *mdia, b"hdlr")
            if not hdlr or content[hdlr[0] + 8 : hdlr[0] + 12] != want:
                continue
            try:
                timescale = 0
                mdhd = _find_box(content, *mdia, b"mdhd")
                if mdhd:
                    hb, _ = mdhd
                    off = 20 if content[hb] == 1 else 12
                    (timescale,) = struct.unpack_from(">I", content, hb + off)
                minf = _find_box(content, *mdia, b"minf")
                stbl = _find_box(content, *minf, b"stbl") if minf else None
                if not stbl:
                    raise ValueError(f"trak {handler!r}: no sample table")
                return _parse_stbl(content, *stbl, timescale)
            except struct.error as e:
                # truncated fixed-width header inside a box: keep the
                # documented ValueError-only contract
                raise ValueError(f"ISO-BMFF: truncated header ({e})") from e
    raise ValueError(f"no {handler!r} track with a sample table")


# sanity cap on sample counts taken from 32-bit header fields before any
# allocation sizes off them: 2^28 frames is >100 days of 25 fps video —
# anything larger is a corrupt table, not a movie
_MAX_SAMPLES = 1 << 28


def _cap_runs(counts: np.ndarray, n: int) -> np.ndarray:
    """Clip run-length counts so their sum is exactly min(sum, n) — the
    expansion never allocates beyond the n samples actually indexed."""
    cum = np.cumsum(counts)
    if len(cum) and cum[-1] > n:
        k = int(np.searchsorted(cum, n))
        counts = counts.copy()
        counts[k] -= int(cum[k] - n)
        counts[k + 1 :] = 0
    return counts


def _parse_stbl(data: bytes, sb: int, se: int, timescale: int) -> dict:
    boxes = {t: (bb, be) for t, bb, be in _walk_boxes(data, sb, se)}
    for req in (b"stsz", b"stco", b"stsc", b"stts"):
        if req not in boxes and not (req == b"stco" and b"co64" in boxes):
            raise ValueError(f"stbl: missing {req.decode('latin-1')}")

    codec = None
    if b"stsd" in boxes:
        db, de = boxes[b"stsd"]
        if de - db >= 16:
            codec = data[db + 12 : db + 16].decode("latin-1")

    # stsz — constant sample_size or a per-sample uint32 table
    zb, ze = _full_box_body(data, *boxes[b"stsz"], "stsz")
    if ze - zb < 8:
        raise ValueError("stsz: truncated")
    const_size, n = struct.unpack_from(">II", data, zb)
    if n > _MAX_SAMPLES:
        raise ValueError(f"stsz: implausible sample count {n}")
    if const_size:
        sizes = np.full(n, const_size, dtype=np.int64)
    else:
        sizes = _u32s(data, zb + 8, n, ze, "stsz")
    if n == 0:
        empty = np.zeros(0, dtype=np.int64)
        return {
            "codec": codec, "timescale": int(timescale), "n": 0,
            "time_sec": empty.astype(np.float64), "offset": empty,
            "size": empty, "keyframe": np.zeros(0, dtype=bool),
        }

    # stco / co64 — chunk offsets
    if b"co64" in boxes:
        cb, ce = _full_box_body(data, *boxes[b"co64"], "co64")
        (n_chunks,) = struct.unpack_from(">I", data, cb)
        if cb + 4 + 8 * n_chunks > ce:
            raise ValueError("co64: table truncated")
        chunk_off = np.frombuffer(
            data, dtype=">u8", count=n_chunks, offset=cb + 4
        ).astype(np.int64)
    else:
        cb, ce = _full_box_body(data, *boxes[b"stco"], "stco")
        (n_chunks,) = struct.unpack_from(">I", data, cb)
        chunk_off = _u32s(data, cb + 4, n_chunks, ce, "stco")

    # stsc — run-length (first_chunk, samples_per_chunk) rows over n_chunks
    xb, xe = _full_box_body(data, *boxes[b"stsc"], "stsc")
    (n_runs,) = struct.unpack_from(">I", data, xb)
    if xb + 4 + 12 * n_runs > xe:
        raise ValueError("stsc: table truncated")
    runs = np.frombuffer(data, dtype=">u4", count=3 * n_runs, offset=xb + 4)
    runs = runs.astype(np.int64).reshape(n_runs, 3)  # first_chunk, spc, sdi
    if n and (n_runs == 0 or n_chunks == 0):
        raise ValueError("stsc/stco: empty for a non-empty stsz")
    spc = np.zeros(n_chunks, dtype=np.int64)
    for i in range(n_runs):
        first = runs[i, 0] - 1  # 1-based
        last = runs[i + 1, 0] - 1 if i + 1 < n_runs else n_chunks
        if first < 0 or first > n_chunks:
            raise ValueError("stsc: first_chunk out of range")
        spc[first:last] = runs[i, 1]
    spc = _cap_runs(spc, n)  # never expand past the n samples indexed
    if spc.sum() < n:
        raise ValueError(f"stsc×stco cover {int(spc.sum())} samples < stsz {n}")
    if (chunk_off < 0).any():
        raise ValueError("stco/co64: chunk offset overflows int64")

    # per-sample offsets: chunk base + exclusive within-chunk size cumsum
    chunk_idx = np.repeat(np.arange(n_chunks), spc)[:n]
    excl = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    first_sample_of_chunk = np.concatenate(
        ([0], np.cumsum(spc))
    )[:-1].clip(max=max(n - 1, 0))
    offsets = chunk_off[chunk_idx] + (excl - excl[first_sample_of_chunk][chunk_idx])

    # stts — decode deltas → timestamps
    tb, te = _full_box_body(data, *boxes[b"stts"], "stts")
    (n_tt,) = struct.unpack_from(">I", data, tb)
    tt = _u32s(data, tb + 4, 2 * n_tt, te, "stts").reshape(n_tt, 2)
    deltas = np.repeat(tt[:, 1], _cap_runs(tt[:, 0].copy(), n))
    if len(deltas) < n:
        raise ValueError(f"stts covers {len(deltas)} samples < stsz {n}")
    times = np.concatenate(([0], np.cumsum(deltas[:n])))[:-1]
    time_sec = times / timescale if timescale else np.full(n, np.nan)

    # stss — sync samples (1-based); absent ⇒ all keyframes (§8.6.2)
    keyframe = np.ones(n, dtype=bool)
    if b"stss" in boxes:
        kb, ke = _full_box_body(data, *boxes[b"stss"], "stss")
        (n_sync,) = struct.unpack_from(">I", data, kb)
        sync = _u32s(data, kb + 4, n_sync, ke, "stss") - 1
        keyframe = np.zeros(n, dtype=bool)
        keyframe[sync[(sync >= 0) & (sync < n)]] = True

    return {
        "codec": codec,
        "timescale": int(timescale),
        "n": int(n),
        "time_sec": time_sec.astype(np.float64),
        "offset": offsets,
        "size": sizes,
        "keyframe": keyframe,
    }


# ---------------------------------------------------------------------------
# AVC / H.264 sequence parameter set (ISO 14496-10 §7.3.2.1, 14496-15 avcC)
# ---------------------------------------------------------------------------
#
# The avc1 sample entry carries an AVCDecoderConfigurationRecord whose SPS
# states the CODED resolution (tkhd is the display size and is routinely
# 0×0 or anamorphic in crawled files). Parsing it needs only an exp-Golomb
# reader — no decoder.

_HIGH_PROFILES = frozenset((100, 110, 122, 244, 44, 83, 86, 118, 128,
                            138, 139, 134, 135))


class _BitReader:
    """MSB-first bit reader with ue(v)/se(v) exp-Golomb (§9.1)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("SPS: bitstream exhausted")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("SPS: exp-Golomb run too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)


def _strip_emulation(nal: bytes) -> bytes:
    """Remove 00 00 03 emulation-prevention bytes from an RBSP (§7.4.1)."""
    out = bytearray()
    zeros = 0
    for b in nal:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue  # the 0x03 is an escape, not payload
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def avc_sps_parse(nal: bytes) -> dict:
    """Parse an SPS NAL unit (with or without its 1-byte NAL header) down
    to the coded picture size: profile/level, chroma format, macroblock
    grid, frame cropping. Returns {"profile_idc", "level_idc", "width",
    "height", "chroma_format_idc"}."""
    if not nal:
        raise ValueError("SPS: empty NAL")
    body = nal[1:] if (nal[0] & 0x1F) == 7 else nal
    r = _BitReader(_strip_emulation(body))
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    level = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma = 1  # 4:2:0 default when not signalled
    if profile in _HIGH_PROFILES:
        chroma = r.ue()
        if chroma == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            for i in range(8 if chroma != 3 else 12):
                if r.u(1):  # seq_scaling_list_present_flag[i]
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt else last
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pw = r.ue()  # pic_width_in_mbs_minus1
    ph = r.ue()  # pic_height_in_map_units_minus1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    if chroma > 3:
        raise ValueError(f"SPS: invalid chroma_format_idc {chroma}")
    sub_w, sub_h = {0: (1, 1), 1: (2, 2), 2: (2, 1), 3: (1, 1)}[chroma]
    unit_x = 1 if chroma == 0 else sub_w
    unit_y = (1 if chroma == 0 else sub_h) * (2 - frame_mbs_only)
    width = (pw + 1) * 16 - unit_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * (ph + 1) * 16 - unit_y * (crop_t + crop_b)
    # ue(v) fields are unbounded garbage in corrupt streams; a coded size
    # outside the 16-bit range every container field uses is not a picture
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"SPS: implausible coded size {width}x{height}")
    return {
        "profile_idc": profile,
        "level_idc": level,
        "chroma_format_idc": chroma,
        "width": width,
        "height": height,
    }


def avcc_parse(body: bytes) -> dict:
    """AVCDecoderConfigurationRecord (ISO 14496-15 §5.3.3.1): profile/level
    plus the first SPS parsed for the coded size."""
    if len(body) < 8 or body[0] != 1:
        raise ValueError("avcC: bad configuration record")
    n_sps = body[5] & 0x1F
    if n_sps < 1:
        raise ValueError("avcC: no SPS")
    (sps_len,) = struct.unpack_from(">H", body, 6)
    if 8 + sps_len > len(body):
        raise ValueError("avcC: SPS truncated")
    info = avc_sps_parse(body[8 : 8 + sps_len])
    info["n_sps"] = n_sps
    return info


# ---------------------------------------------------------------------------
# HEVC / H.265 (ISO 23008-2 §7.3.2.2 SPS prefix, ISO 14496-15 §8.3.3 hvcC)
# ---------------------------------------------------------------------------


def hevc_sps_parse(nal: bytes) -> dict:
    """Parse an HEVC SPS NAL down to the coded picture size: profile/tier/
    level from profile_tier_level, chroma format, luma dimensions, and the
    conformance (cropping) window. Stops after the window — everything a
    size/codec filter needs, nothing a decoder needs."""
    if len(nal) < 2:
        raise ValueError("HEVC SPS: empty NAL")
    body = nal
    if ((nal[0] >> 1) & 0x3F) == 33:  # NAL header present (2 bytes)
        body = nal[2:]
    r = _BitReader(_strip_emulation(body))
    r.u(4)  # sps_video_parameter_set_id
    msl = r.u(3)  # sps_max_sub_layers_minus1
    r.u(1)  # sps_temporal_id_nesting_flag
    # profile_tier_level(1, msl)
    r.u(2)  # general_profile_space
    tier = r.u(1)
    profile = r.u(5)
    r.u(32)  # general_profile_compatibility_flags
    r.u(48)  # general constraint indicator flags
    level = r.u(8)
    # §7.3.3: the present flags are INTERLEAVED per sub-layer (pp0, ll0,
    # pp1, ll1, …), not grouped
    pp, ll = [], []
    for _ in range(msl):
        pp.append(r.u(1))
        ll.append(r.u(1))
    if msl:
        for _ in range(msl, 8):
            r.u(2)  # reserved_zero_2bits
    for i in range(msl):
        if pp[i]:
            r.u(88)  # sub_layer profile block
        if ll[i]:
            r.u(8)  # sub_layer_level_idc
    r.ue()  # sps_seq_parameter_set_id
    chroma = r.ue()
    if chroma > 3:
        raise ValueError(f"HEVC SPS: invalid chroma_format_idc {chroma}")
    if chroma == 3:
        r.u(1)  # separate_colour_plane_flag
    pw = r.ue()  # pic_width_in_luma_samples
    ph = r.ue()  # pic_height_in_luma_samples
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # conformance_window_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    sub_w, sub_h = {0: (1, 1), 1: (2, 2), 2: (2, 1), 3: (1, 1)}[chroma]
    width = pw - sub_w * (crop_l + crop_r)
    height = ph - sub_h * (crop_t + crop_b)
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"HEVC SPS: implausible coded size {width}x{height}")
    return {
        "profile_idc": profile,
        "tier_flag": tier,
        "level_idc": level,
        "chroma_format_idc": chroma,
        "width": width,
        "height": height,
    }


def hvcc_parse(body: bytes) -> dict:
    """HEVCDecoderConfigurationRecord: walk the NAL-unit arrays for the
    first SPS (type 33) and parse it for the coded size."""
    if len(body) < 23 or body[0] != 1:
        raise ValueError("hvcC: bad configuration record")
    n_arrays = body[22]
    pos = 23
    for _ in range(n_arrays):
        if pos + 3 > len(body):
            raise ValueError("hvcC: array header truncated")
        nal_type = body[pos] & 0x3F
        (n_nalus,) = struct.unpack_from(">H", body, pos + 1)
        pos += 3
        for _ in range(n_nalus):
            if pos + 2 > len(body):
                raise ValueError("hvcC: NAL length truncated")
            (ln,) = struct.unpack_from(">H", body, pos)
            pos += 2
            if pos + ln > len(body):
                raise ValueError("hvcC: NAL payload truncated")
            if nal_type == 33:
                return hevc_sps_parse(body[pos : pos + ln])
            pos += ln
    raise ValueError("hvcC: no SPS array")


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def bytes_rbsp(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        raw = bytearray()
        for i in range(0, len(bits), 8):
            raw.append(int("".join(map(str, bits[i : i + 8])), 2))
        # insert emulation-prevention bytes (§7.4.1, inverse of strip)
        out = bytearray()
        zeros = 0
        for b in raw:
            if zeros >= 2 and b <= 3:
                out.append(3)
                zeros = 0
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(out)


def synth_avc_sps(
    width: int, height: int, profile_idc: int = 66, level_idc: int = 30
) -> bytes:
    """Write a spec-conformant baseline-profile SPS NAL for the given coded
    size (frame_mbs_only, 4:2:0; right/bottom cropping when the size is not
    a macroblock multiple) — the round-trip fixture for avc_sps_parse."""
    w = _BitWriter()
    w.u(0x67, 8)  # NAL header: nal_ref_idc=3, type=7 (SPS)
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint flags
    w.u(level_idc, 8)
    w.ue(0)  # sps id
    if profile_idc in _HIGH_PROFILES:
        w.ue(1)  # chroma_format_idc = 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(0, 1)  # qpprime_y_zero_transform_bypass_flag
        w.u(0, 1)  # seq_scaling_matrix_present_flag
    w.ue(4)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    if width <= 0 or height <= 0 or width % 2 or height % 2:
        raise ValueError("synth_avc_sps: 4:2:0 coded sizes must be positive even")
    mb_w, mb_h = -(-width // 16), -(-height // 16)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    crop_r, crop_b = mb_w * 16 - width, mb_h * 16 - height
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r // 2)  # CropUnitX = 2 at 4:2:0
        w.ue(0)
        w.ue(crop_b // 2)  # CropUnitY = 2 (frame_mbs_only)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    return w.bytes_rbsp()


def synth_hevc_sps(
    width: int,
    height: int,
    profile_idc: int = 1,
    level_idc: int = 93,
    tier: int = 0,
) -> bytes:
    """Write the SPS PREFIX `hevc_sps_parse` consumes (through the
    conformance window + rbsp stop bit) for a 4:2:0 coded size — luma
    dimensions padded to the 8-sample minimum CB grid with the remainder
    expressed as a conformance window, exactly as encoders do. A parser
    fixture, not a decodable SPS (fields past the window are omitted)."""
    if width <= 0 or height <= 0 or width % 2 or height % 2:
        raise ValueError("synth_hevc_sps: 4:2:0 coded sizes must be positive even")
    w = _BitWriter()
    w.u(0x42, 8)  # NAL header: type 33 (SPS)
    w.u(0x01, 8)  # nuh_layer_id / temporal_id_plus1
    w.u(0, 4)  # vps id
    w.u(0, 3)  # max_sub_layers_minus1
    w.u(1, 1)  # temporal_id_nesting
    w.u(0, 2)  # profile_space
    w.u(tier, 1)
    w.u(profile_idc, 5)
    w.u(1 << (31 - profile_idc), 32)  # compatibility flag for own profile
    w.u(0, 48)  # constraint flags
    w.u(level_idc, 8)
    w.ue(0)  # sps id
    w.ue(1)  # chroma_format_idc = 4:2:0
    pad_w, pad_h = -(-width // 8) * 8, -(-height // 8) * 8
    w.ue(pad_w)
    w.ue(pad_h)
    if pad_w != width or pad_h != height:
        w.u(1, 1)  # conformance_window_flag
        w.ue(0)
        w.ue((pad_w - width) // 2)  # SubWidthC = 2
        w.ue(0)
        w.ue((pad_h - height) // 2)
    else:
        w.u(0, 1)
    return w.bytes_rbsp()


def synth_hvcc(sps: bytes) -> bytes:
    """Minimal HEVCDecoderConfigurationRecord wrapping one SPS array."""
    head = bytes([1]) + b"\x00" * 21  # version + profile/level fields unused
    arrays = bytes([1, 0x20 | 33]) + struct.pack(">HH", 1, len(sps)) + sps
    return head + arrays


def synth_avcc(sps: bytes, profile_idc: int = 66, level_idc: int = 30) -> bytes:
    """AVCDecoderConfigurationRecord wrapping one SPS + a minimal PPS."""
    pps = b"\x68\xce\x38\x80"  # NAL type 8; contents opaque to the parser
    return (
        bytes([1, profile_idc, 0, level_idc, 0xFC | 3, 0xE0 | 1])
        + struct.pack(">H", len(sps))
        + sps
        + bytes([1])
        + struct.pack(">H", len(pps))
        + pps
    )


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, body: bytes) -> bytes:
    return _box(btype, b"\x00\x00\x00\x00" + body)


def synth_mp4(
    duration_sec: float = 5.0,
    timescale: int = 1000,
    width: int = 640,
    height: int = 360,
    video_codec: bytes = b"avc1",
    audio_codec: bytes = b"mp4a",
    video_samples: list[bytes] | None = None,
    fps: float = 25.0,
    samples_per_chunk: int = 4,
    keyframe_every: int = 0,
    force_co64: bool = False,
    with_avcc: bool = False,
) -> bytes:
    """Build a minimal valid ISO-BMFF tree (ftyp + moov with a video and an
    audio trak) for probe fixtures. With `video_samples`, the layout becomes
    ftyp + mdat(payloads) + moov and the video trak carries REAL sample
    tables — stts (uniform 1/fps deltas), stsz (constant-size form when all
    payloads match, per-sample otherwise), stsc (chunks of
    `samples_per_chunk`), stco/co64 (absolute mdat offsets; mdat-first
    layout so offsets are known before moov is sized), and stss marking
    samples 0, k, 2k… when `keyframe_every` = k > 0 (omitted when 0 ⇒ every
    sample is sync, per spec) — so `mp4_sample_index` is round-trip
    golden-testable without third-party media."""
    if video_samples is not None:
        duration_sec = len(video_samples) / fps if fps else duration_sec
    dur = int(duration_sec * timescale)
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", timescale, dur)
        + b"\x00" * 80,
    )

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")

    # mdat-first layout: sample offsets are absolute file positions, so the
    # payload box is emitted before moov and stco can be computed directly
    mdat = b""
    sample_boxes = b""
    if video_samples is not None:
        payload = b"".join(video_samples)
        mdat = _box(b"mdat", payload)
        nv = len(video_samples)
        sizes = [len(s) for s in video_samples]
        base = len(ftyp) + 8  # first sample byte inside mdat
        n_chunks = max(1, -(-nv // samples_per_chunk)) if nv else 0
        chunk_offs, pos = [], base
        for c in range(n_chunks):
            chunk_offs.append(pos)
            pos += sum(sizes[c * samples_per_chunk : (c + 1) * samples_per_chunk])
        stts = _full(
            b"stts", struct.pack(">III", 1, nv, int(round(timescale / fps)))
        )
        if sizes and len(set(sizes)) == 1:
            stsz = _full(b"stsz", struct.pack(">II", sizes[0], nv))
        else:
            stsz = _full(
                b"stsz", struct.pack(">II", 0, nv) + struct.pack(f">{nv}I", *sizes)
            )
        # first_chunk must be strictly increasing (ISO 14496-12 §8.7.4): a
        # single short chunk gets ONE row, not a same-chunk override
        if n_chunks <= 1:
            stsc_rows = [(1, nv, 1)]
        else:
            stsc_rows = [(1, samples_per_chunk, 1)]
            if nv % samples_per_chunk:
                stsc_rows.append((n_chunks, nv % samples_per_chunk, 1))
        stsc = _full(
            b"stsc",
            struct.pack(">I", len(stsc_rows))
            + b"".join(struct.pack(">III", *r) for r in stsc_rows),
        )
        if force_co64:
            stco = _full(
                b"co64",
                struct.pack(">I", n_chunks)
                + struct.pack(f">{n_chunks}Q", *chunk_offs),
            )
        else:
            stco = _full(
                b"stco",
                struct.pack(">I", n_chunks)
                + struct.pack(f">{n_chunks}I", *chunk_offs),
            )
        sample_boxes = stts + stsz + stsc + stco
        if keyframe_every > 0:
            sync = [i + 1 for i in range(0, nv, keyframe_every)]
            sample_boxes += _full(
                b"stss",
                struct.pack(">I", len(sync)) + struct.pack(f">{len(sync)}I", *sync),
            )

    def trak(handler: bytes, codec: bytes, w: int, h: int) -> bytes:
        tkhd_body = (
            b"\x00\x00\x00\x07" + b"\x00" * 8 + b"\x00" * 4 + b"\x00" * 4
            + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
            + struct.pack(">II", w << 16, h << 16)
        )
        mdhd = _box(
            b"mdhd",
            b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", timescale, dur)
            + b"\x00\x00\x00\x00",
        )
        hdlr = _box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12 + b"probe\x00")
        if with_avcc and handler == b"vide":
            # full VisualSampleEntry (ISO 14496-12 §12.1.3) + codec config
            if codec in (b"hvc1", b"hev1"):
                avcc = _box(b"hvcC", synth_hvcc(synth_hevc_sps(w, h)))
            else:
                avcc = _box(b"avcC", synth_avcc(synth_avc_sps(w, h)))
            ve = (
                b"\x00" * 6 + struct.pack(">H", 1)  # data_reference_index
                + b"\x00" * 16
                + struct.pack(">HH", w, h)
                + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
                + b"\x00" * 4 + struct.pack(">H", 1)  # frame_count
                + b"\x00" * 32  # compressorname
                + struct.pack(">Hh", 0x0018, -1)
            )
            entry = struct.pack(">I", 8 + len(ve) + len(avcc)) + codec + ve + avcc
        else:
            entry = struct.pack(">I", 16) + codec + b"\x00" * 8
        stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
        tables = sample_boxes if handler == b"vide" else b""
        stbl = _box(b"stbl", stsd + tables)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", _box(b"tkhd", tkhd_body) + mdia)

    moov = _box(
        b"moov",
        mvhd
        + trak(b"vide", video_codec, width, height)
        + trak(b"soun", audio_codec, 0, 0),
    )
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# header-only probes for formats we CAN decode (skip the decode cost)
# ---------------------------------------------------------------------------


def flac_probe(content: bytes) -> dict:
    from ocr_spark.operators.flac_codec import flac_parse_streaminfo

    si = flac_parse_streaminfo(content)
    sr = si["sample_rate"]
    total = si["total_samples"]
    dur = total / sr if sr and total else None
    kbps = (len(content) * 8 / dur / 1000.0) if dur else None
    return {
        "container": "flac",
        "codec": f"flac-{si['bits_per_sample']}bit",
        "sample_rate": sr,
        "n_channels": si["n_channels"],
        "n_frames": total,
        "duration_sec": dur,
        "bitrate_kbps": kbps,
        "vbr": True,
    }


def wav_probe(content: bytes) -> dict:
    from ocr_spark.operators.audio_codecs import (
        WAVE_FORMAT_ALAW,
        WAVE_FORMAT_IMA_ADPCM,
        WAVE_FORMAT_MULAW,
        WAVE_FORMAT_PCM,
        wav_parse,
    )

    info = wav_parse(content)
    tag, ch, sr = info["format_tag"], max(1, info["n_channels"]), info["sample_rate"]
    data_len = len(info["data"])
    if tag == WAVE_FORMAT_PCM:
        nframes = data_len // max(1, ch * info["bits_per_sample"] // 8)
    elif tag in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
        nframes = data_len // ch
    elif tag == WAVE_FORMAT_IMA_ADPCM:
        ba = info["block_align"]
        spb = (ba - 4 * ch) * 2 // ch + 1
        nframes = info["fact_samples"] or (data_len // ba) * spb
    else:
        nframes = 0
    names = {
        WAVE_FORMAT_PCM: "pcm", WAVE_FORMAT_ALAW: "alaw",
        WAVE_FORMAT_MULAW: "ulaw", WAVE_FORMAT_IMA_ADPCM: "ima-adpcm",
    }
    dur = nframes / sr if sr else None
    return {
        "container": "wav",
        "codec": names.get(tag, f"0x{tag:04x}"),
        "sample_rate": sr,
        "n_channels": ch,
        "n_frames": nframes,
        "duration_sec": dur,
        "bitrate_kbps": (len(content) * 8 / dur / 1000.0) if dur else None,
        "vbr": False,
    }


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("bitrate_kbps", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
        T.StructField("vbr", T.BooleanType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

_PROBE_COLS = [f.name for f in PROBE_SCHEMA.fields]


def probe_bytes(content: bytes) -> dict:
    """Sniff + probe one payload. Raises for unrecognized containers."""
    head = (content or b"")[:16]
    if head[:4] == b"fLaC":
        return flac_probe(content)
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return wav_probe(content)
    if head[:4] == b"OggS":
        return ogg_probe(content)
    if len(head) >= 8 and head[4:8] in (b"ftyp", b"styp"):
        return mp4_probe(content)
    if head[:3] == b"ID3" or (
        len(head) >= 2 and head[0] == 0xFF and (head[1] & 0xE0) == 0xE0
    ):
        return mp3_probe(content)
    # last resort: crawled MP3s arrive with leading junk (truncation/glue
    # artifacts); mp3_probe resyncs through it, but only dispatch when a
    # VALID frame header actually exists in the resync window — a stray
    # 0xFF in a random payload is not enough
    window = content[: 1 << 16]
    p = window.find(b"\xff")
    while 0 <= p <= len(window) - 4:
        if _mp3_frame_info(int.from_bytes(window[p : p + 4], "big")):
            return mp3_probe(content)
        p = window.find(b"\xff", p + 1)
    raise ValueError("unrecognized media container")


def media_probe(assets: DataFrame) -> DataFrame:
    """Container-metadata probe over (media_ref, content): ONE Arrow stage,
    header-walk only (no decode), per-asset error envelope. The scale
    rationale: duration/codec/bitrate filters run BEFORE any decode ever
    touches a 100-TB corpus."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                row = {k: None for k in _PROBE_COLS}
                row["media_ref"] = ref
                try:
                    info = probe_bytes(bytes(content) if content is not None else b"")
                    for k in _PROBE_COLS:
                        if k in info and info[k] is not None:
                            row[k] = info[k]
                    if row["duration_sec"] is not None:
                        row["duration_sec"] = float(row["duration_sec"])
                    if row["bitrate_kbps"] is not None:
                        row["bitrate_kbps"] = float(row["bitrate_kbps"])
                    if row["n_frames"] is not None:
                        row["n_frames"] = int(row["n_frames"])
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=_PROBE_COLS)

    return assets.mapInPandas(gen, schema=PROBE_SCHEMA)
