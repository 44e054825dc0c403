"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched Pandas UDFs over mapInPandas. Header-level decode (WAV,
netpbm, PNG/GIF/BMP dimensions, JPEG SOF dimensions, MP3 frame-header
duration, FLAC STREAMINFO duration, MP4/ISO-BMFF container duration/
tracks/dimensions — round 18; AVI/RIFF and MKV/WebM-EBML container
duration/tracks/dimensions — r18 extended session) is REAL and
stdlib-only, tested end-to-end through read_blob_files ->
extract_features(mode='real'); only codec-level sample/pixel decode of
compressed payloads, which genuinely needs codec libraries absent from
this container, remains a clearly marked NotImplementedError.

At scale: binary payloads stay columnar in parquet; mapInPandas
processes Arrow batches (no per-row serde), and feature extraction is
embarrassingly parallel — zero shuffles until an aggregate.
"""

from __future__ import annotations

import functools
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from coursera_etl_pipeline_spark.catalog import load_table, scratch_dir
from coursera_etl_pipeline_spark.registry import query

N_FEATURES = 8

BLOB_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])


def as_blobs(df: DataFrame, content_col: str = "text",
             id_col: str = "doc_id",
             media_type: str = "text/plain") -> DataFrame:
    """Promote a content column to the opaque-payload representation:
    (id, payload binary, media_type, n_bytes). With real media the
    payload comes straight off parquet/object storage — same schema."""
    payload = F.encode(F.col(content_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def read_blob_files(spark: SparkSession, path: str,
                    pattern: str = "*") -> DataFrame:
    """Ingest raw media files via Spark's built-in `binaryFile` source
    (one row per file: path, modificationTime, length, content) and
    normalize to the engine's blob schema. This is how image/audio
    corpora actually arrive at 100 TB — millions of object-store files
    read in parallel by input split, no driver-side listing loop.

    doc_id is the first 15 hex chars (60 bits) of md5(path) — a compact
    join key, deterministic across engines (the DuckDB oracle rebuilds
    it with the same substr), but only 60 bits: birthday collisions
    become material around ~10^9 files (~n^2/2^61). `source_path` is
    retained as the true unique key; any pipeline joining billions of
    blobs should key on it (or widen doc_id) rather than assume the
    60-bit surrogate is collision-free."""
    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", pattern).load(path))
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    media = (F.when(ext.isin("jpg", "jpeg", "png", "gif", "ppm", "pgm",
                             "pbm", "bmp"),
                    F.concat(F.lit("image/"), ext))
             .when(ext.isin("wav", "mp3", "flac"),
                   F.concat(F.lit("audio/"), ext))
             .when(ext.isin("mp4", "avi", "mkv"),
                   F.concat(F.lit("video/"), ext))
             .otherwise(F.lit("application/octet-stream")))
    return raw.select(
        F.conv(F.substring(F.md5(F.col("path")), 1, 15), 16, 10)
         .cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
        media.alias("media_type"),
        F.col("length").cast("long").alias("n_bytes"),
        F.col("path").alias("source_path"),
    )


# MPEG-1/2/2.5 Layer III header tables (the public MPEG audio spec):
# bitrate kbps by index, sample rate Hz by index, samples per frame.
_MP3_BITRATES_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                    160, 192, 224, 256, 320, 0)
_MP3_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                    96, 112, 128, 144, 160, 0)
_MP3_RATES = {3: (44100, 48000, 32000),     # version ID 11 = MPEG1
              2: (22050, 24000, 16000),     # 10 = MPEG2
              0: (11025, 12000, 8000)}      # 00 = MPEG2.5


def _decode_jpeg_header(payload: bytes) -> dict:
    """Width/height from the first SOF marker segment — a marker walk
    over segment lengths, touching no entropy-coded data."""
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("malformed JPEG: expected marker, got "
                             f"0x{payload[i]:02x} at offset {i}")
        marker = payload[i + 1]
        if marker == 0xFF:          # fill byte
            i += 1
            continue
        if marker == 0xD9:          # EOI: end of stream — a length read
            break                   # past it would parse trailing bytes
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2                  # standalone markers carry no length
            continue
        seglen = int.from_bytes(payload[i + 2:i + 4], "big")
        if seglen < 2:
            raise ValueError("malformed JPEG: segment length < 2")
        # SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC): [len][prec][h][w]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                raise ValueError("truncated JPEG: SOF segment cut short")
            return {"kind": "image",
                    "width": float(int.from_bytes(payload[i + 7:i + 9], "big")),
                    "height": float(int.from_bytes(payload[i + 5:i + 7], "big"))}
        i += 2 + seglen
    raise ValueError("truncated JPEG: no SOF marker before end of payload")


def _id3v2_size(payload: bytes) -> int:
    """Total byte length of a leading ID3v2 tag: 10-byte header +
    syncsafe 28-bit body size + the optional 10-byte footer (excluded
    from the syncsafe size). Caller has checked payload[:3] == b'ID3'.
    ID3v2 tags prefix MP3 AND (in the wild) FLAC payloads, so the
    dispatcher uses this to sniff the post-tag magic before committing
    to a codec branch (ADVICE r17)."""
    if len(payload) < 10:
        raise ValueError("truncated MP3: ID3 tag header cut short")
    off = 10 + sum((payload[6 + k] & 0x7F) << (7 * (3 - k))
                   for k in range(4))
    if payload[5] & 0x10:           # ID3v2 footer flag
        off += 10
    return off


def _decode_mp3_header(payload: bytes, n_bytes: int) -> dict:
    """Layer-III stream metadata from the first frame header: channel
    mode, sample rate, and the CBR duration estimate
    (audio_bytes * 8 / bitrate) — the same figure `mp3info`-style
    tools report without walking every frame."""
    off = _id3v2_size(payload) if payload[:3] == b"ID3" else 0
    h = payload[off:off + 4]
    if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        raise ValueError("malformed MP3: no frame sync after tag")
    version = (h[1] >> 3) & 0x3     # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h[1] >> 1) & 0x3       # 1 = Layer III
    if version == 1 or layer != 1:
        raise ValueError("unsupported MPEG audio variant (not Layer III)")
    bitrate_idx = (h[2] >> 4) & 0xF
    rate_idx = (h[2] >> 2) & 0x3
    if rate_idx == 3 or bitrate_idx in (0, 15):
        raise ValueError("malformed MP3: reserved bitrate/sample-rate index")
    bitrate = 1000 * (_MP3_BITRATES_V1 if version == 3
                      else _MP3_BITRATES_V2)[bitrate_idx]
    rate = _MP3_RATES[version][rate_idx]
    channels = 1.0 if (h[3] >> 6) & 0x3 == 0x3 else 2.0
    samples_per_frame = 1152 if version == 3 else 576
    # ID3v1 trailer: only when a full 128-byte block fits AFTER the
    # first frame header — for shorter payloads the [-128:] window
    # overlaps the ID3v2 header region and a byte-coincidence "TAG"
    # would undercount audio_bytes (clamped to 0)
    tail = (128 if len(payload) - 128 >= off + 4
            and payload[-128:-125] == b"TAG" else 0)
    audio_bytes = max(n_bytes - off - tail, 0)
    duration = audio_bytes * 8 / bitrate
    return {"kind": "audio", "channels": channels,
            "sample_rate": float(rate), "bits": 0.0,   # compressed: no PCM width
            "n_frames": float(int(duration * rate / samples_per_frame)),
            "duration_sec": duration}


def _decode_flac_streaminfo(payload: bytes) -> dict:
    """Audio metadata from FLAC's mandatory STREAMINFO block — a fixed
    34-byte bit-field parse directly after the 4-byte magic and 4-byte
    block header (the spec requires STREAMINFO as the FIRST metadata
    block), touching no compressed frame data: the same header-only
    discipline as the MP3 frame-header and JPEG SOF parsers (round 8),
    applied to the one audio format the stub still covered (VERDICT
    r16 item 8). Field layout (bits): 16 min-block + 16 max-block +
    24 min-frame + 24 max-frame + 20 sample-rate + 3 (channels-1) +
    5 (bits-1) + 36 total-samples + 128 md5."""
    if len(payload) < 8:
        raise ValueError("truncated FLAC: metadata block header cut short")
    btype = payload[4] & 0x7F
    blen = int.from_bytes(payload[5:8], "big")
    if btype != 0:
        raise ValueError(
            f"malformed FLAC: first metadata block has type {btype}; "
            "STREAMINFO (type 0) is mandatory first")
    if blen < 34:
        raise ValueError(f"malformed FLAC: STREAMINFO length {blen} < 34")
    b = payload[8:42]
    if len(b) < 34:
        raise ValueError("truncated FLAC: STREAMINFO cut short")
    rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    channels = ((b[12] >> 1) & 0x7) + 1
    bits = (((b[12] & 0x1) << 4) | (b[13] >> 4)) + 1
    total = ((b[13] & 0x0F) << 32) | int.from_bytes(b[14:18], "big")
    if rate == 0:
        raise ValueError("malformed FLAC: sample rate 0 is invalid")
    # total == 0 means 'unknown' per spec: surfaced as 0 frames /
    # 0.0 s rather than an error (the stream itself is well-formed)
    return {"kind": "audio", "channels": float(channels),
            "sample_rate": float(rate), "bits": float(bits),
            "n_frames": float(total), "duration_sec": total / rate}


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for each ISO BMFF box in
    [start, end) — the declared-size walk every MP4 reader starts
    with. size==1 pulls the 64-bit largesize; size==0 means
    'to end of enclosing box' (legal only for the last box)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(buf[i:i + 4], "big")
        btype = buf[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("truncated MP4: largesize cut short")
            size = int.from_bytes(buf[i + 8:i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError(
                f"malformed MP4: box {btype!r} declares {size} bytes "
                f"at offset {i} but the payload ends at {end}")
        yield btype, i + hdr, i + size
        i += size


def _decode_mp4_header(payload: bytes) -> dict:
    """Video-container metadata from the ISO BMFF box tree (the public
    ISO/IEC 14496-12 layout): presentation duration and timescale from
    moov/mvhd, track count and max presentation width/height from the
    traks' tkhd boxes (16.16 fixed point) — a fixed walk over declared
    box sizes touching no sample data, the FLAC-STREAMINFO discipline
    applied to the container half of the r17 video stub (VERDICT r17
    item 7). Only codec-level sample/keyframe decode remains
    NotImplementedError."""
    n = len(payload)
    duration = timescale = None
    n_tracks, width, height = 0, 0.0, 0.0
    for btype, body, bend in _mp4_boxes(payload, 0, n):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in _mp4_boxes(payload, body, bend):
            if ctype == b"mvhd":
                v = payload[cbody]
                need = cbody + (32 if v == 1 else 20)
                if v not in (0, 1) or need > cend:
                    raise ValueError("malformed MP4: mvhd cut short "
                                     f"or bad version {v}")
                if v == 1:
                    timescale = int.from_bytes(
                        payload[cbody + 20:cbody + 24], "big")
                    duration = int.from_bytes(
                        payload[cbody + 24:cbody + 32], "big")
                else:
                    timescale = int.from_bytes(
                        payload[cbody + 12:cbody + 16], "big")
                    duration = int.from_bytes(
                        payload[cbody + 16:cbody + 20], "big")
            elif ctype == b"trak":
                n_tracks += 1
                for ttype, tbody, tend in _mp4_boxes(payload, cbody, cend):
                    if ttype != b"tkhd":
                        continue
                    v = payload[tbody]
                    woff = tbody + (88 if v == 1 else 76)
                    if v not in (0, 1) or woff + 8 > tend:
                        raise ValueError("malformed MP4: tkhd cut short "
                                         f"or bad version {v}")
                    # 16.16 fixed point; audio tracks carry 0x0
                    width = max(width, int.from_bytes(
                        payload[woff:woff + 4], "big") / 65536.0)
                    height = max(height, int.from_bytes(
                        payload[woff + 4:woff + 8], "big") / 65536.0)
    if timescale is None:
        raise ValueError("malformed MP4: no moov/mvhd box in payload")
    if timescale == 0:
        raise ValueError("malformed MP4: mvhd timescale 0 is invalid")
    return {"kind": "video", "n_tracks": float(n_tracks),
            "width": width, "height": height,
            "duration_sec": duration / timescale}


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each RIFF chunk in
    [start, end) — fourcc + u32le size + body, bodies padded to even
    length (the padding byte is not part of the declared size)."""
    i = start
    while i + 8 <= end:
        fourcc = buf[i:i + 4]
        size = int.from_bytes(buf[i + 4:i + 8], "little")
        body = i + 8
        if body + size > end:
            raise ValueError(
                f"malformed RIFF: chunk {fourcc!r} declares {size} bytes "
                f"at offset {i} but the payload ends at {end}")
        yield fourcc, body, body + size
        i = body + size + (size & 1)


def _decode_avi_header(payload: bytes) -> dict:
    """Video-container metadata from the AVI main header (the public
    RIFF/AVI layout, MSDN AVIMAINHEADER): frame period and total frame
    count (their product is the exact duration in micros), stream
    count, and frame width/height from the 56-byte `avih` chunk inside
    LIST/hdrl — a fixed chunk walk touching no sample data; unknown
    chunks (JUNK, movi, ...) are skipped by declared size. Extends the
    r18 MP4 box walk to the RIFF container family (VERDICT r17 item 7
    follow-through); only codec-level sample decode remains
    NotImplementedError."""
    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("malformed AVI: RIFF/'AVI ' signature missing")
    for fourcc, body, bend in _riff_chunks(payload, 12, n):
        if fourcc != b"LIST" or payload[body:body + 4] != b"hdrl":
            continue
        for c4, cbody, cend in _riff_chunks(payload, body + 4, bend):
            if c4 != b"avih":
                continue
            if cend - cbody < 40:
                raise ValueError("malformed AVI: avih main header "
                                 f"is {cend - cbody} bytes, need >= 40")
            u32 = [int.from_bytes(payload[cbody + 4 * k:cbody + 4 * k + 4],
                                  "little") for k in range(10)]
            usec_per_frame, total_frames, streams = u32[0], u32[4], u32[6]
            return {"kind": "video", "n_tracks": float(streams),
                    "width": float(u32[8]), "height": float(u32[9]),
                    "duration_sec": (usec_per_frame * total_frames) / 1e6}
    raise ValueError("malformed AVI: no LIST/hdrl/avih header chunk")


def _ebml_vint(buf: bytes, i: int, end: int, keep_marker: bool):
    """Decode the EBML variable-size integer at offset i: the leading
    byte's first set bit gives the width (1-8 bytes). Element IDs keep
    the marker bit (they are compared as raw bytes); sizes strip it.
    Returns (value_or_raw, next_offset)."""
    if i >= end:
        raise ValueError("truncated MKV: vint starts past payload end")
    first = buf[i]
    if first == 0:
        raise ValueError(f"malformed MKV: invalid vint lead byte at {i}")
    width = 8 - first.bit_length() + 1
    if i + width > end:
        raise ValueError(f"truncated MKV: {width}-byte vint at {i} cut short")
    raw = buf[i:i + width]
    if keep_marker:
        return bytes(raw), i + width
    val = (first & (0xFF >> width)).to_bytes(1, "big") + raw[1:]
    return int.from_bytes(val, "big"), i + width


def _ebml_elements(buf: bytes, start: int, end: int):
    """Yield (id_bytes, body_start, body_end) for each EBML element in
    [start, end) — ID vint (marker kept), size vint, body."""
    i = start
    while i < end:
        eid, j = _ebml_vint(buf, i, end, keep_marker=True)
        size, body = _ebml_vint(buf, j, end, keep_marker=False)
        if body + size > end:
            raise ValueError(
                f"malformed MKV: element {eid.hex()} declares {size} bytes "
                f"at offset {i} but the payload ends at {end}")
        yield eid, body, body + size
        i = body + size


def _decode_mkv_header(payload: bytes) -> dict:
    """Video-container metadata from the Matroska/EBML element tree
    (the public RFC 8794 EBML + Matroska layouts): duration from
    Segment/Info (Duration float x TimecodeScale ns, default scale
    1e6), track count from Segment/Tracks' TrackEntry elements, and
    max pixel dims from their Video/PixelWidth+PixelHeight uints — a
    declared-size vint walk touching no cluster/sample data. WebM uses
    the same structure. Only codec-level sample decode remains
    NotImplementedError."""
    import struct

    n = len(payload)
    duration_units = None
    timecode_scale = 1_000_000          # Matroska default: 1 ms in ns
    n_tracks, width, height = 0, 0.0, 0.0
    for eid, body, bend in _ebml_elements(payload, 0, n):
        if eid != b"\x18\x53\x80\x67":          # Segment
            continue
        for sid, sbody, send in _ebml_elements(payload, body, bend):
            if sid == b"\x15\x49\xa9\x66":      # Info
                for iid, ibody, iend in _ebml_elements(payload, sbody, send):
                    if iid == b"\x2a\xd7\xb1":  # TimecodeScale (uint)
                        timecode_scale = int.from_bytes(
                            payload[ibody:iend], "big")
                    elif iid == b"\x44\x89":    # Duration (float 4/8)
                        w = iend - ibody
                        if w == 8:
                            duration_units = struct.unpack(
                                ">d", payload[ibody:iend])[0]
                        elif w == 4:
                            duration_units = float(struct.unpack(
                                ">f", payload[ibody:iend])[0])
                        else:
                            raise ValueError(
                                f"malformed MKV: Duration is {w} bytes, "
                                "EBML floats are 4 or 8")
            elif sid == b"\x16\x54\xae\x6b":    # Tracks
                for tid, tbody, tend in _ebml_elements(payload, sbody, send):
                    if tid != b"\xae":          # TrackEntry
                        continue
                    n_tracks += 1
                    for vid, vbody, vend in _ebml_elements(
                            payload, tbody, tend):
                        if vid != b"\xe0":      # Video settings
                            continue
                        for pid, pbody, pend in _ebml_elements(
                                payload, vbody, vend):
                            if pid == b"\xb0":  # PixelWidth
                                width = max(width, float(int.from_bytes(
                                    payload[pbody:pend], "big")))
                            elif pid == b"\xba":  # PixelHeight
                                height = max(height, float(int.from_bytes(
                                    payload[pbody:pend], "big")))
    if duration_units is None:
        raise ValueError("malformed MKV: no Segment/Info/Duration element")
    if timecode_scale == 0:
        raise ValueError("malformed MKV: TimecodeScale 0 is invalid")
    return {"kind": "video", "n_tracks": float(n_tracks),
            "width": width, "height": height,
            "duration_sec": (duration_units * timecode_scale) / 1e9}


def decode_media(payload: bytes, media_type: str) -> dict:
    """Header-level decode for formats a stdlib-only parser can handle
    — REAL, executor-side, tested end-to-end:

      - WAV (RIFF/PCM): channels, sample rate, sample width, frame
        count, duration — via the stdlib ``wave`` module;
      - MP3 (MPEG Layer III): channels, sample rate, CBR duration
        estimate from the first frame header (ID3v2 tags skipped);
      - FLAC: channels, sample rate, bit depth, total samples and
        exact duration from the mandatory STREAMINFO block (round 17
        — a fixed 34-byte bit-field parse, no frame decode);
      - PPM/PGM/PBM (P1-P6): width x height from the ASCII header
        (comment lines skipped per the netpbm spec);
      - PNG / GIF / BMP: width x height at fixed header offsets;
      - JPEG: width x height from the SOF marker segment;
      - MP4/ISO-BMFF (round 18): duration from moov/mvhd, track count
        and presentation width/height from the tkhd boxes — a declared-
        size box walk, no sample data touched;
      - AVI (RIFF): frame period x frame count duration, stream count
        and frame dims from the LIST/hdrl avih main header — the same
        declared-size walk over the RIFF chunk grammar;
      - MKV/WebM (EBML): Duration x TimecodeScale from Segment/Info,
        TrackEntry count and max PixelWidth/PixelHeight from
        Segment/Tracks — a declared-size vint walk (RFC 8794).

    Failure contract: a payload that MATCHES a supported magic but has
    a truncated or malformed header raises ValueError (with context —
    never a garbage 0x0 dimension); only codec-level sample/pixel
    decode of compressed payloads, which genuinely needs codec
    libraries absent here, still raises NotImplementedError."""
    if payload[:4] == b"fLaC":
        return _decode_flac_streaminfo(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return _decode_avi_header(payload)
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        return _decode_mkv_header(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(bytes(payload))) as w:
                rate, frames = w.getframerate(), w.getnframes()
                return {"kind": "audio", "channels": float(w.getnchannels()),
                        "sample_rate": float(rate),
                        "bits": float(w.getsampwidth() * 8),
                        "n_frames": float(frames),
                        "duration_sec": frames / rate if rate else 0.0}
        except (wave.Error, EOFError) as e:
            raise ValueError(
                f"malformed RIFF/WAVE payload ({len(payload)} bytes): {e}"
            ) from e
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg_header(payload)
    if payload[:3] == b"ID3":
        # ID3v2 tags prefix FLAC files in the wild too — sniff the
        # post-tag magic before committing to the MP3 branch, else an
        # ID3-tagged FLAC dies on a misleading 'no frame sync'
        # (ADVICE r17). STREAMINFO offsets are magic-relative, so the
        # tag is sliced off; MP3 keeps the whole payload (its CBR
        # duration subtracts the tag from audio_bytes itself).
        off = _id3v2_size(payload)
        if payload[off:off + 4] == b"fLaC":
            return _decode_flac_streaminfo(payload[off:])
        return _decode_mp3_header(payload, len(payload))
    if (len(payload) >= 2 and payload[0] == 0xFF
            and (payload[1] & 0xE0) == 0xE0):
        return _decode_mp3_header(payload, len(payload))
    if payload[:2] in {b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"}:
        # netpbm header: magic, then whitespace-separated tokens with
        # '#'-to-EOL comments; first two numeric tokens are w, h
        dims, i, n = [], 2, len(payload)
        while len(dims) < 2 and i < n:
            c = payload[i:i + 1]
            if c == b"#":
                while i < n and payload[i:i + 1] != b"\n":
                    i += 1
            elif c.isdigit():
                j = i
                while j < n and payload[j:j + 1].isdigit():
                    j += 1
                dims.append(int(payload[i:j]))
                i = j
            else:
                i += 1
        if len(dims) != 2:
            raise ValueError("truncated netpbm header: width/height missing")
        return {"kind": "image", "width": float(dims[0]),
                "height": float(dims[1])}
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24:
            raise ValueError("truncated PNG: IHDR cut short")
        return {"kind": "image",
                "width": float(int.from_bytes(payload[16:20], "big")),
                "height": float(int.from_bytes(payload[20:24], "big"))}
    if payload[:6] in {b"GIF87a", b"GIF89a"}:
        if len(payload) < 10:
            raise ValueError("truncated GIF: logical screen descriptor cut short")
        return {"kind": "image",
                "width": float(int.from_bytes(payload[6:8], "little")),
                "height": float(int.from_bytes(payload[8:10], "little"))}
    if payload[:2] == b"BM":
        if len(payload) < 26:
            raise ValueError("truncated BMP: info header cut short")
        return {"kind": "image",
                "width": float(int.from_bytes(payload[18:22], "little", signed=True)),
                "height": float(abs(int.from_bytes(payload[22:26], "little", signed=True)))}
    if payload[4:8] == b"ftyp":
        return _decode_mp4_header(payload)
    raise NotImplementedError(
        f"payload decode for {media_type!r} requires codec libraries "
        "not present in this environment (compressed sample/pixel "
        "decode; every supported container's header parse is above)")


FEATURE_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                  "features array<double>")


def extract_features(blobs: DataFrame, mode: str = "fake") -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow
    batches in/out — the pattern for any real embedding/CNN step).

    mode='fake': deterministic per-byte-histogram features (8 buckets,
    L1-normalized) so tests can assert exact values; mode='real'
    header-decodes each payload (decode_media) into a typed vector:
    audio -> [1, channels, sample_rate, bits, n_frames, duration, 0, 0],
    image -> [2, width, height, width*height, 0, 0, 0, 0]."""

    def real_features(payload: bytes, media_type: str) -> list[float]:
        meta = decode_media(payload, media_type)
        if meta["kind"] == "audio":
            return [1.0, meta["channels"], meta["sample_rate"],
                    meta["bits"], meta["n_frames"], meta["duration_sec"],
                    0.0, 0.0]
        return [2.0, meta["width"], meta["height"],
                meta["width"] * meta["height"], 0.0, 0.0, 0.0, 0.0]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                if mode == "real":
                    feats.append(real_features(payload, mt))
                    continue
                buckets = [0] * N_FEATURES
                for byte in payload:
                    buckets[byte % N_FEATURES] += 1
                total = max(sum(buckets), 1)
                feats.append([b / total for b in buckets])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "features": feats,
            })

    return blobs.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(blobs: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: slice the payload at a fixed stride
    (real video would decode + sample keyframes here — same shape:
    one input row -> many frame rows). Built-ins only."""
    return blobs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0),
                           F.greatest((F.col("n_bytes") / every_n_bytes).cast("int") - 1,
                                      F.lit(0))),
                lambda i: F.substring(F.col("payload"),
                                      (i * every_n_bytes + 1).cast("int"),
                                      every_n_bytes))
        ).alias("frame_idx", "frame_bytes"),
    )


FRAME_STRIDE = 64


@query(
    "multimodal_frame_sample",
    # closed-form oracle over the documents-as-blobs corpus: per doc,
    # frames = max(trunc(n_bytes/stride), 1); frame k is the byte
    # slice [k*stride, k*stride+stride). The fixture text is pure
    # ASCII at every scale (pinned by test_documents_fixture_is_ascii)
    # so DuckDB's CHARACTER substring/md5 equal Spark's BYTE slice —
    # the one place the two engines' string/binary semantics are
    # reconciled by a data property rather than an expression.
    oracle=f"""
    SELECT d.doc_id,
           CAST(t.i AS INTEGER) AS frame_idx,
           CAST(LEAST({FRAME_STRIDE},
                      octet_length(encode(d.text)) - t.i * {FRAME_STRIDE})
                AS INTEGER) AS n_frame_bytes,
           md5(substring(d.text, CAST(t.i * {FRAME_STRIDE} + 1 AS BIGINT),
                         {FRAME_STRIDE})) AS frame_md5
    FROM documents d, LATERAL (
      SELECT unnest(range(0,
        greatest(octet_length(encode(d.text)) // {FRAME_STRIDE}, 1))) AS i) t
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-sampling verb at driver level, completing the
    multimodal quartet (decode / feature-extract / resize /
    FRAME-SAMPLE): fixed-stride payload slicing via `sample_frames`
    (posexplode over a built-in sequence+transform — one input row ->
    many frame rows, no Python), projected to per-frame byte counts
    and content hashes the SQL oracle can replicate. Real video would
    swap the slicer for a keyframe decoder with the identical
    one-to-many shape.

    Scale shape: embarrassingly parallel narrow op — the explode
    multiplies rows ~n_bytes/stride before any shuffle, so downstream
    aggregates see frame-level parallelism for free."""
    blobs = as_blobs(load_table(spark, sf_dir, "documents"))
    return (sample_frames(blobs, every_n_bytes=FRAME_STRIDE)
            .select("doc_id", "frame_idx",
                    F.length("frame_bytes").alias("n_frame_bytes"),
                    F.md5("frame_bytes").alias("frame_md5")))


def _parse_netpbm_raw(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, channels, data_offset) of a raw netpbm payload
    (P5 grayscale / P6 RGB, maxval <= 255). Header = magic + up to 3
    whitespace-separated numeric tokens with '#'-to-EOL comments,
    terminated by exactly ONE whitespace byte before the pixel data."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError(
            "resize supports raw netpbm (P5/P6) only in this "
            "environment; compressed formats need codec libraries")
    channels = 3 if magic == b"P6" else 1
    vals, i, n = [], 2, len(payload)
    while len(vals) < 3 and i < n:
        c = payload[i:i + 1]
        if c == b"#":
            while i < n and payload[i:i + 1] != b"\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < n and payload[j:j + 1].isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            i += 1
    if len(vals) < 3:
        raise ValueError("truncated netpbm header: width/height/maxval missing")
    width, height, maxval = vals
    if maxval > 255:
        raise ValueError(f"16-bit netpbm (maxval {maxval}) not supported")
    i += 1  # the single whitespace byte after maxval
    if n - i < width * height * channels:
        raise ValueError("truncated netpbm payload: pixel data cut short")
    return width, height, channels, i


RESIZE_SCHEMA = ("doc_id long, payload binary, media_type string, "
                 "in_width long, in_height long, "
                 "out_width long, out_height long, n_bytes long")


def resize_images(blobs: DataFrame, max_side: int = 8) -> DataFrame:
    """Nearest-neighbor resize over Arrow batches (mapInPandas + numpy)
    — the third verb of the multimodal quartet (decode /
    feature-extract / RESIZE / frame-sample). REAL for raw netpbm
    (P5/P6): header parse, numpy reshape, index-select rows/columns,
    re-emit valid netpbm bytes; compressed formats raise
    NotImplementedError from `_parse_netpbm_raw` (decode->resize->
    re-encode is a pure function swap once codec libs exist).

    Deterministic semantics (pinned by test and oracle): the output's
    longest side is min(max_side, input side); source index for output
    pixel k along a dimension of input size s and output size t is
    floor(k * s / t) — the standard nearest-neighbor grid, exactly
    reproducible in integer arithmetic. Scale shape: embarrassingly
    parallel, one Arrow batch in -> one out, payload bytes never leave
    the executor."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "payload", "media_type",
                                    "in_width", "in_height",
                                    "out_width", "out_height", "n_bytes")}
            for doc_id, payload, mt in zip(pdf["doc_id"], pdf["payload"],
                                           pdf["media_type"]):
                payload = bytes(payload)
                w, h, ch, off = _parse_netpbm_raw(payload)
                scale = max(w, h) / max_side
                nw = max(1, int(w / scale)) if scale > 1 else w
                nh = max(1, int(h / scale)) if scale > 1 else h
                arr = (np.frombuffer(payload, np.uint8, count=w * h * ch,
                                     offset=off).reshape(h, w, ch))
                yi = (np.arange(nh) * h) // nh
                xi = (np.arange(nw) * w) // nw
                small = arr[yi][:, xi]
                magic = b"P6" if ch == 3 else b"P5"
                out = (magic + b"\n" + f"{nw} {nh}\n255\n".encode()
                       + small.tobytes())
                for k, v in (("doc_id", doc_id), ("payload", out),
                             ("media_type", mt), ("in_width", w),
                             ("in_height", h), ("out_width", nw),
                             ("out_height", nh), ("n_bytes", len(out))):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(batches, schema=RESIZE_SCHEMA)


@query(
    "multimodal_blob_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text)                  AS payload_md5,
           'text/plain'               AS media_type
    FROM documents
    """,
)
def multimodal_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque payloads — the oracle-checkable slice
    of the multimodal surface (byte length + content hash)."""
    blobs = as_blobs(load_table(spark, sf_dir, "documents"))
    return blobs.select(
        "doc_id", "n_bytes",
        F.md5("payload").alias("payload_md5"),
        "media_type",
    )


N_FIXTURE_IMAGES = 24
RESIZE_MAX_SIDE = 8


@functools.lru_cache(maxsize=1)
def _image_fixture_dir() -> str:
    """Write a deterministic raw-netpbm image corpus once per process:
    image i is (8 + (i%5)*4) x (6 + ((i*3)%7)*3), P5 grayscale when
    i % 3 == 0 else P6 RGB, pixel = (y*13 + x*7 + i) % 256 per channel
    — a pure function of the index, so the resize output's metadata is
    a closed-form DuckDB expression (same golden-fixture pattern as
    pipeline_courses_parity)."""

    import numpy as np

    d = scratch_dir("mm_images_")
    for i in range(N_FIXTURE_IMAGES):
        w = 8 + (i % 5) * 4
        h = 6 + ((i * 3) % 7) * 3
        ch = 1 if i % 3 == 0 else 3
        arr = ((np.arange(h)[:, None, None] * 13
                + np.arange(w)[None, :, None] * 7 + i) % 256).astype(np.uint8)
        arr = np.repeat(arr, ch, axis=2)
        magic, ext = (b"P5", "pgm") if ch == 1 else (b"P6", "ppm")
        data = magic + b"\n" + f"{w} {h}\n255\n".encode() + arr.tobytes()
        with open(f"{d}/img_{i:02d}.{ext}", "wb") as fh:
            fh.write(data)
    return d


@query(
    "multimodal_resize",
    # closed-form metadata of the nearest-neighbor resize over the
    # generated fixture: output dims replicate resize_images' exact
    # integer arithmetic (same IEEE division + floor in both engines),
    # n_bytes counts the re-emitted netpbm header + pixel block
    oracle=f"""
    WITH g AS (SELECT unnest(range({N_FIXTURE_IMAGES})) AS i),
    d AS (
      SELECT i,
             CAST(8 + (i % 5) * 4 AS BIGINT)       AS w,
             CAST(6 + ((i * 3) % 7) * 3 AS BIGINT) AS h,
             CASE WHEN i % 3 = 0 THEN 1 ELSE 3 END AS ch
      FROM g
    ), r AS (
      SELECT *,
        CASE WHEN GREATEST(w, h) > {RESIZE_MAX_SIDE}
             THEN GREATEST(CAST(FLOOR(w / (GREATEST(w, h) / {RESIZE_MAX_SIDE}.0)) AS BIGINT), 1)
             ELSE w END AS ow,
        CASE WHEN GREATEST(w, h) > {RESIZE_MAX_SIDE}
             THEN GREATEST(CAST(FLOOR(h / (GREATEST(w, h) / {RESIZE_MAX_SIDE}.0)) AS BIGINT), 1)
             ELSE h END AS oh
      FROM d
    )
    SELECT 'img_' || lpad(CAST(i AS VARCHAR), 2, '0')
             || CASE WHEN ch = 1 THEN '.pgm' ELSE '.ppm' END AS name,
           w AS in_width, h AS in_height,
           ow AS out_width, oh AS out_height,
           CAST(3 + length(CAST(ow AS VARCHAR)) + 1
                + length(CAST(oh AS VARCHAR)) + 5 + ow * oh * ch
                AS BIGINT) AS n_bytes
    FROM r
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize verb end-to-end over REAL files: binaryFile ingest of
    the generated netpbm corpus -> mapInPandas nearest-neighbor resize
    -> metadata projection. The oracle rebuilds the fixture's closed
    form and the resize arithmetic in SQL, so the driver hash
    certifies dimensions and re-encoded byte counts; exact output
    PIXELS are pinned separately by test_llm_ops (numpy equality on
    crafted inputs — SQL cannot express pixel blocks)."""
    blobs = read_blob_files(spark, _image_fixture_dir())
    resized = resize_images(blobs, max_side=RESIZE_MAX_SIDE)
    names = blobs.select(
        "doc_id",
        F.element_at(F.split("source_path", "/"), -1).alias("name"))
    return (resized.join(names, "doc_id")
            .select("name", "in_width", "in_height",
                    "out_width", "out_height", "n_bytes"))


# --- certified audio metadata over a golden mixed-codec fixture ---------------
#
# Round-18 pre-build (r17): the audio-decode path (WAV via stdlib
# `wave`, MP3 frame header, FLAC STREAMINFO — all REAL header parses)
# promoted to a driver-certifiable query: a deterministic 24-file
# WAV/FLAC/MP3 corpus whose every parameter is a pure function of the
# file index, so the DuckDB oracle rebuilds the expected metadata in
# closed form (the _image_fixture_dir / multimodal_resize golden-
# fixture pattern applied to audio). Closes the r17 "FLAC oracle row"
# descope. Registration deferred to round 18 behind
# stream_bloom_bits_parity (160 band edge); pinned registry name
# `multimodal_audio_metadata`.

N_FIXTURE_AUDIO = 24

AUDIO_META_SCHEMA = ("name string, kind string, channels long, "
                     "sample_rate long, bits long, n_frames long, "
                     "duration_micro long, n_bytes long")


@functools.lru_cache(maxsize=1)
def _audio_fixture_dir() -> str:
    """Write the deterministic audio corpus once per process. File i:
      i%3==0 -> WAV  (rate 8000+(i%4)*4000, 1+(i%2) ch, 16-bit PCM,
                      400*(i+1) frames; stdlib wave, canonical 44-byte
                      header so n_bytes = 44 + frames*ch*2)
      i%3==1 -> FLAC (magic + last-block STREAMINFO only, 42 bytes:
                      rate 44100/48000 by parity, 2 ch,
                      16/24-bit by i%4<2, 1000*(i+1) total samples)
      i%3==2 -> MP3  (3+(i%5) CBR MPEG1 Layer-III frames at
                      128 kbps / 44100 Hz mono, 417 bytes each)"""
    import io
    import wave

    d = scratch_dir("mm_audio_")
    for i in range(N_FIXTURE_AUDIO):
        if i % 3 == 0:
            rate, ch, frames = 8000 + (i % 4) * 4000, 1 + (i % 2), 400 * (i + 1)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(ch)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(bytes(2 * ch * frames))
            data, ext = buf.getvalue(), "wav"
        elif i % 3 == 1:
            rate = 44100 if i % 2 == 0 else 48000
            bits = 16 if i % 4 < 2 else 24
            total = 1000 * (i + 1)
            info = bytearray(34)
            info[0:2] = (4096).to_bytes(2, "big")
            info[2:4] = (4096).to_bytes(2, "big")
            info[10] = (rate >> 12) & 0xFF
            info[11] = (rate >> 4) & 0xFF
            info[12] = ((rate & 0xF) << 4) | ((2 - 1) << 1) | ((bits - 1) >> 4)
            info[13] = (((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
            info[14:18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
            data = b"fLaC\x80" + (34).to_bytes(3, "big") + bytes(info)
            ext = "flac"
        else:
            data = (b"\xff\xfb\x90\xc0" + b"\x00" * 413) * (3 + (i % 5))
            ext = "mp3"
        with open(f"{d}/aud_{i:02d}.{ext}", "wb") as fh:
            fh.write(data)
    return d


def audio_metadata(blobs: DataFrame) -> DataFrame:
    """(name, kind, channels, sample_rate, bits, n_frames,
    duration_micro, n_bytes) per blob via the REAL header decoders —
    mapInPandas over Arrow batches, payload bytes never leave the
    executor. duration_micro = floor(duration_sec * 1e6 + 0.5): the
    one float (an IEEE division identical on both engines) rounds to
    an exact BIGINT at the output boundary, the dsum discipline
    applied to decode metadata."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("name", "kind", "channels",
                                    "sample_rate", "bits", "n_frames",
                                    "duration_micro", "n_bytes")}
            for path, payload, mt, nb in zip(
                    pdf["source_path"], pdf["payload"],
                    pdf["media_type"], pdf["n_bytes"]):
                meta = decode_media(bytes(payload), mt)
                rows["name"].append(path.rsplit("/", 1)[-1])
                rows["kind"].append(meta["kind"])
                rows["channels"].append(int(meta["channels"]))
                rows["sample_rate"].append(int(meta["sample_rate"]))
                rows["bits"].append(int(meta["bits"]))
                rows["n_frames"].append(int(meta["n_frames"]))
                rows["duration_micro"].append(
                    int(math.floor(meta["duration_sec"] * 1_000_000 + 0.5)))
                rows["n_bytes"].append(int(nb))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(batches, schema=AUDIO_META_SCHEMA)


def multimodal_audio_metadata_core(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The future `multimodal_audio_metadata` registry callable
    (deferred to r18): binaryFile ingest of the golden audio corpus ->
    mapInPandas header decode -> typed metadata. sf_dir is unused (the
    fixture is self-generated, the multimodal_resize convention)."""
    return audio_metadata(read_blob_files(spark, _audio_fixture_dir()))


def r18_multimodal_audio_metadata_oracle() -> str:
    """Closed-form DuckDB oracle: rebuilds every file's parameters
    from the index arithmetic and replays the decoders' duration
    expressions with the identical IEEE operation order (frames/rate
    then *1e6 then +0.5 then floor; MP3's int() truncation is floor on
    the positive domain)."""
    return f"""
    WITH g AS (SELECT unnest(range({N_FIXTURE_AUDIO})) AS i),
    w AS (
      SELECT i, 8000 + (i % 4) * 4000 AS rate, 1 + (i % 2) AS ch,
             400 * (i + 1) AS frames
      FROM g WHERE i % 3 = 0
    ),
    f AS (
      SELECT i, CASE WHEN i % 2 = 0 THEN 44100 ELSE 48000 END AS rate,
             CASE WHEN i % 4 < 2 THEN 16 ELSE 24 END AS bits,
             1000 * (i + 1) AS total
      FROM g WHERE i % 3 = 1
    ),
    m AS (
      SELECT i, 417 * (3 + (i % 5)) AS abytes FROM g WHERE i % 3 = 2
    ),
    rows_ AS (
      SELECT i, CAST(ch AS BIGINT) AS channels,
             CAST(rate AS BIGINT) AS sample_rate,
             CAST(16 AS BIGINT) AS bits,
             CAST(frames AS BIGINT) AS n_frames,
             CAST(floor((CAST(frames AS DOUBLE) / rate) * 1000000.0
                        + 0.5) AS BIGINT) AS duration_micro,
             CAST(44 + frames * ch * 2 AS BIGINT) AS n_bytes,
             'wav' AS ext
      FROM w
      UNION ALL
      SELECT i, 2, CAST(rate AS BIGINT), CAST(bits AS BIGINT),
             CAST(total AS BIGINT),
             CAST(floor((CAST(total AS DOUBLE) / rate) * 1000000.0
                        + 0.5) AS BIGINT),
             42, 'flac'
      FROM f
      UNION ALL
      SELECT i, 1, 44100, 0,
             CAST(floor(CAST(abytes AS DOUBLE) * 8 / 128000 * 44100
                        / 1152) AS BIGINT),
             CAST(floor((CAST(abytes AS DOUBLE) * 8 / 128000)
                        * 1000000.0 + 0.5) AS BIGINT),
             CAST(abytes AS BIGINT), 'mp3'
      FROM m
    )
    SELECT 'aud_' || lpad(CAST(i AS VARCHAR), 2, '0') || '.' || ext AS name,
           'audio' AS kind, channels, sample_rate, bits, n_frames,
           duration_micro, n_bytes
    FROM rows_
    """


# --- perceptual-hash image near-dup (dHash) ---------------------------------
#
# Where the dedup and multimodal families meet: a 64-bit difference
# hash over decoded pixels, then the SAME banded-hamming equi-join
# discipline as dedup_simhash (8 byte bands over the two 32-bit
# halves; pigeonhole-complete for hamming <= 7). Reference scope
# analog: the reference pipeline has no image ops at all — this is
# part of the training-data extension the brief mandates.

DHASH_ROWS = 8       # sample grid: 8 rows x 9 cols -> 8x8 comparisons
DHASH_COLS = 9
DHASH_MAX_HAMMING = 6   # 8 bands => banded join complete to hamming 7
N_DHASH_IMAGES = 32

DHASH_SCHEMA = "doc_id long, dhash_lo long, dhash_hi long"


def image_dhash(blobs: DataFrame) -> DataFrame:
    """64-bit dHash per image (mapInPandas + numpy): grayscale by
    integer channel mean, nearest-neighbor sample onto the fixed
    8x9 grid (source index floor(k*s/t), the resize_images
    arithmetic), bit (r,c) = gray[r,c] < gray[r,c+1]. Brightness
    shifts barely move it (adjacent comparisons are offset-invariant
    except at the mod-256 wrap); distinct gradients randomize it —
    the textbook perceptual fingerprint, deterministic enough for a
    closed-form SQL oracle.

    Returned as two 32-bit halves (bits 0-31 / 32-63) so every
    engine-side value stays well under 2^63 — no signed-overflow
    hazard in Spark, DuckDB, or parquet stats. Scale shape:
    embarrassingly parallel, one Arrow batch in -> 3 longs out;
    payload bytes never leave the executor."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "dhash_lo": [], "dhash_hi": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                w, h, ch, off = _parse_netpbm_raw(payload)
                arr = (np.frombuffer(payload, np.uint8, count=w * h * ch,
                                     offset=off)
                       .reshape(h, w, ch).astype(np.int64))
                gray = arr.sum(axis=2) // ch
                yi = (np.arange(DHASH_ROWS) * h) // DHASH_ROWS
                xi = (np.arange(DHASH_COLS) * w) // DHASH_COLS
                g = gray[yi][:, xi]
                bits = (g[:, :-1] < g[:, 1:]).astype(np.int64).ravel()
                lo = int((bits[:32] << np.arange(32)).sum())
                hi = int((bits[32:] << np.arange(32)).sum())
                out["doc_id"].append(doc_id)
                out["dhash_lo"].append(lo)
                out["dhash_hi"].append(hi)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(batches, schema=DHASH_SCHEMA)


@functools.lru_cache(maxsize=1)
def _dhash_fixture_dir() -> str:
    """Deterministic netpbm corpus with PLANTED near-duplicate pairs:
    16 groups x 2 variants. Group g fixes dims (12 + (g%4)*5 wide,
    10 + (g%5)*4 tall — all 16 (w,h) pairs distinct), channel count
    (P5 when g%3==0 else P6), and pseudo-random per-group content
    base(y,x) = (((x*73 + y*151 + g*3571) * 2654435761) >> 8) % 256
    (a Knuth multiplicative mix — smooth gradients are DEGENERATE
    dHash subjects: monotone rows make every comparison bit 1 and
    unrelated images collide); variant v=1 perturbs only the sparse
    (x+y) % 23 == 0 diagonal by +128 — a localized edit whose dHash
    lands at hamming 0-5 of its base (measured: cross-group minimum
    8, median 31, so the planted 16 pairs are EXACTLY the pairs
    under the threshold). Pure function of the index, so the whole
    pipeline has a closed-form DuckDB oracle."""

    import numpy as np

    d = scratch_dir("mm_dhash_")
    for i in range(N_DHASH_IMAGES):
        g, v = divmod(i, 2)
        w = 12 + (g % 4) * 5
        h = 10 + (g % 5) * 4
        ch = 1 if g % 3 == 0 else 3
        y, x = np.mgrid[0:h, 0:w]
        base = (((x * 73 + y * 151 + g * 3571) * 2654435761) >> 8) % 256
        pix = (base + np.where((x + y) % 23 == 0, v * 128, 0)) % 256
        arr = np.repeat(pix.astype(np.uint8)[:, :, None], ch, axis=2)
        magic, ext = (b"P5", "pgm") if ch == 1 else (b"P6", "ppm")
        data = magic + b"\n" + f"{w} {h}\n255\n".encode() + arr.tobytes()
        with open(f"{d}/img_{i:02d}.{ext}", "wb") as fh:
            fh.write(data)
    return d


def _duck_dhash_hashes() -> str:
    """Closed-form DuckDB CTE chain ending in hashes(i, lo, hi) — the
    fixture's sampled-grid pixels -> comparison bits -> 32-bit halves.
    Shared by the pairs oracle and the clusters oracle (byte-identical
    emission for the pre-existing registered SQL)."""
    return f"""WITH imgs AS (
      SELECT CAST(i AS BIGINT) AS i, i // 2 AS g, i % 2 AS v
      FROM (SELECT unnest(range({N_DHASH_IMAGES})) AS i)
    ), dims AS (
      SELECT i, v, g,
             12 + (g % 4) * 5 AS w, 10 + (g % 5) * 4 AS h
      FROM imgs
    ), cells AS (
      -- sampled source coordinates of the 8x9 dHash grid
      SELECT d.i, d.v, d.g, r.r, c.c,
             r.r * d.h // {DHASH_ROWS} AS y,
             c.c * d.w // {DHASH_COLS} AS x0,
             (c.c + 1) * d.w // {DHASH_COLS} AS x1
      FROM dims d,
           generate_series(0, {DHASH_ROWS - 1}) r(r),
           generate_series(0, {DHASH_ROWS - 1}) c(c)
    ), bits AS (
      -- pixel(y,x) = Knuth-mix base + the sparse v-diagonal bump
      SELECT i, r, c,
             CASE WHEN
               (((x0 * 73 + y * 151 + g * 3571) * 2654435761 // 256) % 256
                + CASE WHEN (x0 + y) % 23 = 0 THEN v * 128 ELSE 0 END) % 256
             < (((x1 * 73 + y * 151 + g * 3571) * 2654435761 // 256) % 256
                + CASE WHEN (x1 + y) % 23 = 0 THEN v * 128 ELSE 0 END) % 256
             THEN 1 ELSE 0 END AS bit
      FROM cells
    ), hashes AS (
      SELECT i,
             SUM(CASE WHEN r * 8 + c < 32
                      THEN bit * CAST(pow(2, r * 8 + c) AS BIGINT)
                      ELSE 0 END) AS lo,
             SUM(CASE WHEN r * 8 + c >= 32
                      THEN bit * CAST(pow(2, r * 8 + c - 32) AS BIGINT)
                      ELSE 0 END) AS hi
      FROM bits GROUP BY i
    )"""


@query(
    "dedup_image_dhash",
    # the oracle recomputes every dHash from the fixture's closed form
    # (sampled-grid pixel values -> comparison bits -> 32-bit halves)
    # and takes the O(n^2) hamming join — exact at n=32; the Spark
    # side must reproduce it bit-for-bit through REAL file ingest,
    # pixel decode, and the banded candidate join
    oracle=f"""
    {_duck_dhash_hashes()}
    SELECT a.i AS doc_a, b.i AS doc_b,
           CAST(bit_count(xor(a.lo, b.lo))
                + bit_count(xor(a.hi, b.hi)) AS INTEGER) AS hamming
    FROM hashes a JOIN hashes b ON a.i < b.i
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
          <= {DHASH_MAX_HAMMING}
    """,
)
def dedup_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate IMAGE pairs at hamming <= 6, end to
    end over real files: binaryFile ingest -> mapInPandas dHash ->
    8-band hamming equi-join (dedup_simhash's machinery over the two
    32-bit halves; any pair within hamming 7 agrees on >= 1 byte
    band, so the equality shuffle finds every qualifying pair — no
    O(n^2) cross join). Pairs are keyed by the fixture index parsed
    from the file name so the oracle never touches paths; the planted
    brightness-shift variants are the expected recoveries."""
    blobs = read_blob_files(spark, _dhash_fixture_dir())
    idx = F.regexp_extract(
        F.element_at(F.split("source_path", "/"), -1),
        r"img_(\d+)", 1).cast("long")
    hashes = image_dhash(blobs.withColumn("doc_id", idx)
                         .select("doc_id", "payload"))

    chunks = hashes.select(
        "doc_id", "dhash_lo", "dhash_hi",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("ci"),
    ).withColumn("chunk", F.expr(
        "CASE WHEN ci < 4 "
        "THEN (dhash_lo div CAST(pow(2, ci * 8) AS BIGINT)) % 256 "
        "ELSE (dhash_hi div CAST(pow(2, (ci - 4) * 8) AS BIGINT)) % 256 END"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.ci") == F.col("b.ci"))
               & (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"), F.col("a.ci").alias("ci"),
                F.col("a.dhash_lo").alias("la"), F.col("a.dhash_hi").alias("ha"),
                F.col("b.dhash_lo").alias("lb"), F.col("b.dhash_hi").alias("hb")))
    # emit each pair once WITHOUT a dedup shuffle: keep it only at the
    # FIRST zero byte of the xor (the simhash first-zero trick, 8-wide)
    xlo = F.col("la").bitwiseXOR(F.col("lb"))
    xhi = F.col("ha").bitwiseXOR(F.col("hb"))
    byte = ([F.shiftright(xlo, 8 * j).bitwiseAND(F.lit(255)) for j in range(4)]
            + [F.shiftright(xhi, 8 * j).bitwiseAND(F.lit(255)) for j in range(4)])
    first_zero = F.when(byte[0] == 0, 0)
    for j in range(1, 7):
        first_zero = first_zero.when(byte[j] == 0, j)
    first_zero = first_zero.otherwise(7)
    hamming = F.bit_count(xlo) + F.bit_count(xhi)
    return (cand.filter((F.col("ci") == first_zero)
                        & (hamming <= DHASH_MAX_HAMMING))
            .select("doc_a", "doc_b", hamming.cast("int").alias("hamming")))


@query(
    "dedup_image_clusters",
    # the pairs oracle's closed-form hashes, then the same
    # recursive-CTE transitive closure dedup_components pins: label =
    # min reachable image index over the hamming<=threshold graph
    oracle=f"""
    {_duck_dhash_hashes().replace("WITH ", "WITH RECURSIVE ", 1)}, pairs AS (
      SELECT a.i AS doc_a, b.i AS doc_b
      FROM hashes a JOIN hashes b ON a.i < b.i
      WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
            <= {DHASH_MAX_HAMMING}
    ), edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ), reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
    )
    SELECT u AS doc_id, MIN(r) AS component
    FROM reach GROUP BY u
    """,
)
def dedup_image_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-IMAGE cluster labels: the dHash near-dup pair graph
    resolved to connected components by the alternating-star algorithm
    (llm_ops.clusters) — the same find-pairs -> resolve-clusters ->
    keep-canonical pipeline a production image corpus runs, certified
    end to end: mapInPandas pixel decode -> banded hamming join ->
    ITERATIVE component labeling, against a recursive-CTE closure over
    closed-form pixels. On the planted fixture the components are
    exactly the 16 variant pairs."""
    from coursera_etl_pipeline_spark.llm_ops.clusters import (
        connected_components,
    )

    return connected_components(dedup_image_dhash(spark, sf_dir))


@query("multimodal_audio_metadata",
       oracle=r18_multimodal_audio_metadata_oracle())
def multimodal_audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered round 18 under the pre-staged name (COVERAGE.md
    round-17 queue): the audio decode path (WAV / MP3 frame header /
    the r17 FLAC STREAMINFO parse) over the golden 24-file mixed-codec
    fixture. Core, closed-form oracle, and planted parity pytest
    (test_r18_multimodal_audio_metadata) landed in r17; closes the r17
    'FLAC oracle row' descope note."""
    return multimodal_audio_metadata_core(spark, sf_dir)


# --- certified video container metadata over a golden MP4 fixture -------------
#
# Round-19 pre-build (r18): the MP4/ISO-BMFF box walk (this round's
# decode_media addition — VERDICT r17 item 7) promoted to a
# driver-certifiable query, the exact lifecycle the audio quartet
# followed (decoder round N, golden-fixture oracle row round N+1): a
# deterministic 18-file MP4 corpus whose every parameter is a pure
# function of the file index, so the DuckDB oracle rebuilds the
# expected metadata in closed form. Registration deferred to round 19
# (the r18 certification window is consumed by the 8-deep queue);
# pinned registry name `multimodal_video_metadata`.

N_FIXTURE_VIDEO = 18

VIDEO_META_SCHEMA = ("name string, kind string, n_tracks long, "
                     "width long, height long, duration_micro long, "
                     "n_bytes long")


@functools.lru_cache(maxsize=1)
def _video_fixture_dir() -> str:
    """Write the deterministic MP4 corpus once per process. File i:
    mvhd version i%2 (v1 exercises the 64-bit duration path),
    timescale 600*(1+i%3), duration units ts*(i+1) + 37*i, a video
    trak at (320+16*(i%5)) x (240+16*(i%3)) 16.16 fixed point, plus a
    second zero-dim (audio) trak when i%2==1. Container boxes only —
    no sample data, the FLAC-STREAMINFO fixture discipline."""
    def box(btype: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    d = scratch_dir("mm_video_")
    for i in range(N_FIXTURE_VIDEO):
        ts = 600 * (1 + i % 3)
        dur = ts * (i + 1) + 37 * i
        if i % 2 == 1:
            mvhd = (bytes([1, 0, 0, 0]) + b"\x00" * 16
                    + ts.to_bytes(4, "big") + dur.to_bytes(8, "big"))
        else:
            mvhd = (bytes(4) + b"\x00" * 8
                    + ts.to_bytes(4, "big") + dur.to_bytes(4, "big"))
        dims = [(320 + 16 * (i % 5), 240 + 16 * (i % 3))]
        if i % 2 == 1:
            dims.append((0, 0))     # the audio trak carries 0x0
        moov_body = box(b"mvhd", mvhd)
        for w, h in dims:
            tkhd = (bytes(4) + b"\x00" * 72
                    + (w * 65536).to_bytes(4, "big")
                    + (h * 65536).to_bytes(4, "big"))
            moov_body += box(b"trak", box(b"tkhd", tkhd))
        data = box(b"ftyp", b"isom\x00\x00\x00\x00") + box(b"moov", moov_body)
        with open(f"{d}/vid_{i:02d}.mp4", "wb") as fh:
            fh.write(data)
    return d


def video_metadata(blobs: DataFrame) -> DataFrame:
    """(name, kind, n_tracks, width, height, duration_micro, n_bytes)
    per blob via the REAL ISO-BMFF box walk — mapInPandas over Arrow
    batches, payload bytes never leave the executor. Widths/heights
    are whole presentation pixels on this corpus, emitted as exact
    BIGINTs; duration rounds to BIGINT micros at the output boundary
    (the audio_metadata discipline)."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("name", "kind", "n_tracks", "width",
                                    "height", "duration_micro", "n_bytes")}
            for path, payload, mt, nb in zip(
                    pdf["source_path"], pdf["payload"],
                    pdf["media_type"], pdf["n_bytes"]):
                meta = decode_media(bytes(payload), mt)
                rows["name"].append(path.rsplit("/", 1)[-1])
                rows["kind"].append(meta["kind"])
                rows["n_tracks"].append(int(meta["n_tracks"]))
                rows["width"].append(int(meta["width"]))
                rows["height"].append(int(meta["height"]))
                rows["duration_micro"].append(
                    int(math.floor(meta["duration_sec"] * 1_000_000 + 0.5)))
                rows["n_bytes"].append(int(nb))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(batches, schema=VIDEO_META_SCHEMA)


def multimodal_video_metadata_core(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The future `multimodal_video_metadata` registry callable
    (deferred to r19): binaryFile ingest of the golden MP4 corpus ->
    mapInPandas box walk -> typed metadata. sf_dir is unused (the
    fixture is self-generated, the multimodal_resize convention)."""
    return video_metadata(read_blob_files(spark, _video_fixture_dir()))


def r19_multimodal_video_metadata_oracle() -> str:
    """Closed-form DuckDB oracle: rebuilds every file's parameters
    from the index arithmetic and replays the box walk's duration
    division with the identical IEEE operation order (units/timescale
    then *1e6 then +0.5 then floor). n_bytes replays the fixture's box
    layout: 16 (ftyp) + 8 (moov header) + mvhd box (28 v0 / 40 v1) +
    100 per trak (8 trak header + 8 tkhd header + 84 tkhd body)."""
    return f"""
    WITH g AS (SELECT unnest(range({N_FIXTURE_VIDEO})) AS i),
    p AS (
      SELECT i, 600 * (1 + i % 3) AS ts,
             600 * (1 + i % 3) * (i + 1) + 37 * i AS dur,
             1 + (i % 2) AS n_tracks,
             320 + 16 * (i % 5) AS w, 240 + 16 * (i % 3) AS h,
             CASE WHEN i % 2 = 0 THEN 28 ELSE 40 END AS mvhd_box
      FROM g
    )
    SELECT 'vid_' || lpad(CAST(i AS VARCHAR), 2, '0') || '.mp4' AS name,
           'video' AS kind,
           CAST(n_tracks AS BIGINT) AS n_tracks,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(floor((CAST(dur AS DOUBLE) / ts) * 1000000.0 + 0.5)
                AS BIGINT) AS duration_micro,
           CAST(24 + mvhd_box + n_tracks * 100 AS BIGINT) AS n_bytes
    FROM p
    """


# --- certified container metadata over a golden AVI + MKV fixture -------------
#
# Round-19 pre-build (r18, second multimodal member): the RIFF/AVI
# chunk walk and the Matroska/EBML vint walk (this round's
# decode_media additions — the non-ISO-BMFF half of VERDICT r17
# item 7) promoted to a driver-certifiable query, the exact lifecycle
# the MP4 row follows: a deterministic 18-file corpus (9 AVI + 9 MKV)
# whose every parameter is a pure function of the file index, so the
# DuckDB oracle rebuilds the expected metadata AND the byte-exact
# container layout in closed form. Registration deferred to round 19
# (the r18 certification window is consumed by the 8-deep queue);
# pinned registry name `multimodal_container_metadata`.

N_FIXTURE_CONTAINER = 9   # per container family


@functools.lru_cache(maxsize=1)
def _container_fixture_dir() -> str:
    """Write the deterministic AVI+MKV corpus once per process.

    AVI file i: usec/frame 33000+100i, total frames 24(i+1)+7i (their
    product is the exact duration in micros), dwStreams 1+i%2, dims
    (640+16(i%4)) x (360+16(i%3)), plus an i-byte JUNK chunk (padded
    to even per RIFF) so the walk skips an unknown chunk in every
    non-trivial file. Layout: 12-byte RIFF header + LIST/hdrl holding
    one 56-byte avih + JUNK -> n_bytes = 96 + i + (i%2).

    MKV file i: TimecodeScale cycles {1e6, 5e5, 2e6} ns, Duration
    float64 1000(i+1)+17i units, one video TrackEntry at
    (1280+16(i%5)) x (720+16(i%4)), plus an audio TrackEntry (no Video
    element) when i%3==0. Every size vint is encoded 2-byte wide so
    the layout is closed-form: EBML header 18 + Segment header 6 +
    Info 26 + Tracks (22 video-only / 28 with audio) -> n_bytes =
    72 + 6*(i%3==0)."""
    import struct

    d = scratch_dir("mm_container_")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + len(body).to_bytes(4, "little") + body + pad

    for i in range(N_FIXTURE_CONTAINER):
        u, f = 33000 + 100 * i, 24 * (i + 1) + 7 * i
        avih = (u.to_bytes(4, "little") + bytes(12)
                + f.to_bytes(4, "little") + bytes(4)
                + (1 + i % 2).to_bytes(4, "little") + bytes(4)
                + (640 + 16 * (i % 4)).to_bytes(4, "little")
                + (360 + 16 * (i % 3)).to_bytes(4, "little") + bytes(16))
        assert len(avih) == 56
        body = (b"AVI " + chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
                + chunk(b"JUNK", bytes(i)))
        data = b"RIFF" + len(body).to_bytes(4, "little") + body
        with open(f"{d}/avi_{i:02d}.avi", "wb") as fh:
            fh.write(data)

    def el(eid: bytes, body: bytes) -> bytes:
        return eid + bytes([0x40 | (len(body) >> 8), len(body) & 0xFF]) + body

    scales = (1_000_000, 500_000, 2_000_000)
    for i in range(N_FIXTURE_CONTAINER):
        info = el(b"\x15\x49\xa9\x66",
                  el(b"\x2a\xd7\xb1", scales[i % 3].to_bytes(3, "big"))
                  + el(b"\x44\x89",
                       struct.pack(">d", 1000.0 * (i + 1) + 17.0 * i)))
        vte = el(b"\xae", el(b"\xe0",
                             el(b"\xb0",
                                (1280 + 16 * (i % 5)).to_bytes(2, "big"))
                             + el(b"\xba",
                                  (720 + 16 * (i % 4)).to_bytes(2, "big"))))
        ate = el(b"\xae", el(b"\xe1", b"")) if i % 3 == 0 else b""
        tracks = el(b"\x16\x54\xae\x6b", vte + ate)
        data = (el(b"\x1a\x45\xdf\xa3", el(b"\x42\x82", b"matroska"))
                + el(b"\x18\x53\x80\x67", info + tracks))
        with open(f"{d}/mkv_{i:02d}.mkv", "wb") as fh:
            fh.write(data)
    return d


def multimodal_container_metadata_core(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """The future `multimodal_container_metadata` registry callable
    (deferred to r19): binaryFile ingest of the golden AVI+MKV corpus
    -> the shared mapInPandas decode (video_metadata dispatches
    through decode_media, which sniffs RIFF/'AVI ' and the EBML magic)
    -> typed metadata. sf_dir is unused (self-generated fixture, the
    multimodal_resize convention)."""
    return video_metadata(read_blob_files(spark, _container_fixture_dir()))


def r19_multimodal_container_metadata_oracle() -> str:
    """Closed-form DuckDB oracle: rebuilds every file's parameters
    from the index arithmetic and replays each decoder's duration
    division in the identical IEEE operation order (AVI:
    (usec_per_frame * frames) / 1e6; MKV: (units * scale_ns) / 1e9 —
    then *1e6 + 0.5, floor). n_bytes replays the byte-exact container
    layouts documented on the fixture."""
    return f"""
    WITH g AS (SELECT unnest(range({N_FIXTURE_CONTAINER})) AS i),
    avi AS (
      SELECT 'avi_' || lpad(CAST(i AS VARCHAR), 2, '0') || '.avi' AS name,
             'video' AS kind,
             CAST(1 + i % 2 AS BIGINT) AS n_tracks,
             CAST(640 + 16 * (i % 4) AS BIGINT) AS width,
             CAST(360 + 16 * (i % 3) AS BIGINT) AS height,
             CAST(floor((CAST((33000 + 100 * i) * (24 * (i + 1) + 7 * i)
                              AS DOUBLE) / 1000000.0)
                        * 1000000.0 + 0.5) AS BIGINT) AS duration_micro,
             CAST(96 + i + (i % 2) AS BIGINT) AS n_bytes
      FROM g
    ),
    mkv AS (
      SELECT 'mkv_' || lpad(CAST(i AS VARCHAR), 2, '0') || '.mkv' AS name,
             'video' AS kind,
             CAST(CASE WHEN i % 3 = 0 THEN 2 ELSE 1 END AS BIGINT)
               AS n_tracks,
             CAST(1280 + 16 * (i % 5) AS BIGINT) AS width,
             CAST(720 + 16 * (i % 4) AS BIGINT) AS height,
             CAST(floor(((CAST(1000 * (i + 1) + 17 * i AS DOUBLE)
                          * (CASE i % 3 WHEN 0 THEN 1000000
                                        WHEN 1 THEN 500000
                                        ELSE 2000000 END))
                         / 1000000000.0)
                        * 1000000.0 + 0.5) AS BIGINT) AS duration_micro,
             CAST(72 + CASE WHEN i % 3 = 0 THEN 6 ELSE 0 END AS BIGINT)
               AS n_bytes
      FROM g
    )
    SELECT * FROM avi UNION ALL SELECT * FROM mkv
    """
