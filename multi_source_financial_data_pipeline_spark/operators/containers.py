"""Pure-stdlib media CONTAINER demux: ISO-BMFF (MP4) box walk and OGG
page walk.

Shrinks the md5-stub boundary to exactly the codec PAYLOADS: after the
r09 baseline JPEG codec, the remaining stubbed formats were "MP4/OGG" —
but those are containers, and their structure (boxes/pages, metadata,
stream layout) is fully specified public format, parseable with
`struct` alone. Demux here is REAL: strict box-size/page-CRC validation
(a random blob cannot false-positive), duration/dimensions/track layout
extracted from the actual bytes — including the codec ID HEADERS, which
are fixed-field, entropy-free and therefore stdlib-parseable: the
Vorbis I identification header inside OGG pages (`parse_vorbis_id`) and
the AAC AudioSpecificConfig inside the MP4 mp4a→esds descriptor chain
(`parse_audio_specific_config`). What stays stubbed is decoding the
codec bitstream INSIDE a track (H.264/AAC/Vorbis PAYLOADS need entropy
decoders far beyond stdlib) — `require_codecs=True` still raises at
exactly that boundary.

Builders (`mp4_build`, `ogg_build`) exist so tests and synthetic
corpora round-trip the same bytes the parsers walk — the same
encoder/decoder symmetry as the repo's BMP/PNG/WAV/JPEG codecs.
"""

from __future__ import annotations

import struct

# --- ISO base media file format (MP4) ----------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


#: ISO/IEC 14496-3 Table 1.18 — samplingFrequencyIndex → Hz (15 = escape)
AAC_SAMPLE_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)


def aac_audio_specific_config(
    object_type: int, sample_rate: int, channels: int
) -> bytes:
    """AudioSpecificConfig (ISO/IEC 14496-3 §1.6.2.1), the 2-byte header
    every MP4 AAC track carries inside its esds box: audioObjectType
    (5 bits, e.g. 2 = AAC-LC), samplingFrequencyIndex (4 bits, Table
    1.18), channelConfiguration (4 bits), 3 zero bits (GASpecificConfig
    framing for the fields we emit). Like the Vorbis id header this is
    CONTAINER-ADJACENT metadata — fixed bit fields, no entropy coding."""
    if not (1 <= object_type <= 31 and 1 <= channels <= 7):
        raise ValueError(f"bad object_type/channels: {object_type}/{channels}")
    idx = AAC_SAMPLE_RATES.index(sample_rate)  # raises for non-standard rates
    bits = (object_type << 11) | (idx << 7) | (channels << 3)
    return struct.pack(">H", bits)


def _descriptor(tag: int, body: bytes) -> bytes:
    """MPEG-4 BaseDescriptor: tag byte + expandable size (we always emit
    the 1-byte form; bodies here are far below 128 bytes)."""
    if len(body) >= 128:
        raise ValueError("descriptor body too large for 1-byte size form")
    return bytes([tag, len(body)]) + body


def esds_box(asc: bytes) -> bytes:
    """`esds` full box (ISO/IEC 14496-14 §5.6): ES_Descriptor(tag 3) →
    DecoderConfigDescriptor(tag 4, objectTypeIndication 0x40 = MPEG-4
    Audio) → DecSpecificInfo(tag 5) carrying the AudioSpecificConfig,
    plus the mandatory SLConfigDescriptor(tag 6, predefined 2)."""
    dec_specific = _descriptor(0x05, asc)
    dec_config = _descriptor(
        0x04,
        # objectTypeIndication 0x40, streamType 5 (audio) <<2 | 1, then
        # bufferSizeDB(24) / maxBitrate(32) / avgBitrate(32) all zero
        bytes([0x40, (5 << 2) | 1]) + b"\x00" * 11 + dec_specific,
    )
    sl_config = _descriptor(0x06, b"\x02")
    es = _descriptor(
        0x03, struct.pack(">HB", 1, 0) + dec_config + sl_config
    )
    return _box(b"esds", struct.pack(">Bxxx", 0) + es)


def _stbl_for_mp4a(sample_rate: int, channels: int, asc: bytes) -> bytes:
    """Sample table for one AAC audio track: stsd with a single `mp4a`
    AudioSampleEntry (ISO/IEC 14496-12 §12.2.3 offsets: 6 reserved bytes +
    data_reference_index, two reserved ints, channelcount(16),
    samplesize(16)=16, pre_defined+reserved, samplerate as 16.16 fixed)
    whose child is the esds; plus the spec-mandatory empty stts / stsc /
    stsz / stco (no samples in the synthetic corpus — payload stays in
    mdat as opaque bytes)."""
    mp4a = _box(
        b"mp4a",
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 8
        # samplerate is a 16.16 template field; rates >= 2^16 don't fit
        # and per 14496-12 §12.2.3 the esds (ASC) is authoritative — the
        # convention real muxers use is 0 here for such rates
        + struct.pack(
            ">HHHHI",
            channels, 16, 0, 0,
            (sample_rate << 16) if sample_rate < 65536 else 0,
        )
        + esds_box(asc),
    )
    stsd = _box(b"stsd", struct.pack(">BxxxI", 0, 1) + mp4a)
    stts = _box(b"stts", struct.pack(">BxxxI", 0, 0))
    stsc = _box(b"stsc", struct.pack(">BxxxI", 0, 0))
    stsz = _box(b"stsz", struct.pack(">BxxxII", 0, 0, 0))
    stco = _box(b"stco", struct.pack(">BxxxI", 0, 0))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def mp4_build(
    duration_ms: int,
    tracks: list[tuple[str, int, int]],
    payload: bytes = b"",
    aac: tuple[int, int, int] | None = None,
) -> bytes:
    """Minimal valid ISO-BMFF file: ftyp + moov(mvhd + trak*) + mdat.
    `tracks` is a list of (handler, width, height) — handler "vide" or
    "soun" (audio tracks carry 0×0 dims, per spec). Movie timescale is
    1000, so mvhd duration == duration_ms. With ``aac=(object_type,
    sample_rate, channels)``, every "soun" track gains the full
    minf→stbl→stsd→mp4a→esds chain carrying a real AudioSpecificConfig —
    the header `parse_mp4` extracts codec audio metadata from."""
    mvhd = _box(
        b"mvhd",
        struct.pack(">BxxxIIIIi", 0, 0, 0, 1000, duration_ms, 0x00010000)
        + struct.pack(">h", 0x0100)
        + b"\x00" * 2
        + b"\x00" * 8
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", len(tracks) + 1),
    )
    traks = b""
    for tid, (handler, w, h) in enumerate(tracks, start=1):
        tkhd = _box(
            b"tkhd",
            # version(1) + 24-bit flags(3) + creation/modification/
            # track_ID/reserved as four 4-byte fields — 20 bytes, the
            # spec's v0 offsets (an earlier ">BBHH" prefix emitted 6
            # bytes of version+flags, shifting everything by 2)
            struct.pack(">BBBBIIII", 0, 0, 0, 7, 0, 0, tid, 0)
            + struct.pack(">I", duration_ms)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0x0100 if handler == "soun" else 0, 0)
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _box(
            b"mdhd",
            struct.pack(">BxxxIIII", 0, 0, 0, 1000, duration_ms)
            + struct.pack(">HH", 0x55C4, 0),  # 'und' language
        )
        hdlr = _box(
            b"hdlr",
            struct.pack(">Bxxx", 0) + b"\x00" * 4 + handler.encode("ascii")
            + b"\x00" * 12 + b"\x00",
        )
        minf = b""
        if aac is not None and handler == "soun":
            obj, rate, chans = aac
            smhd = _box(b"smhd", struct.pack(">BxxxHH", 0, 0, 0))
            dref = _box(
                b"dref",
                struct.pack(">BxxxI", 0, 1)
                + _box(b"url ", struct.pack(">Bxxx", 1)),  # self-contained
            )
            minf = _box(
                b"minf",
                smhd
                + _box(b"dinf", dref)
                + _stbl_for_mp4a(
                    rate, chans, aac_audio_specific_config(obj, rate, chans)
                ),
            )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", payload)
    return ftyp + moov + mdat


def parse_audio_specific_config(asc: bytes) -> dict | None:
    """Strict AudioSpecificConfig parse (ISO/IEC 14496-3 §1.6.2.1):
    audioObjectType(5) + samplingFrequencyIndex(4) [+24-bit explicit rate
    when the index is the escape value 15] + channelConfiguration(4).
    Returns {"object_type", "sample_rate", "channels"} or None; a
    channelConfiguration of 0 (channel map deferred to an in-stream PCE,
    i.e. inside the codec bitstream) is rejected — that is exactly the
    stubbed boundary."""
    if len(asc) < 2:
        return None
    b0, b1 = asc[0], asc[1]
    object_type = b0 >> 3
    freq_idx = ((b0 & 0x07) << 1) | (b1 >> 7)
    if object_type == 0:
        return None
    if freq_idx == 15:
        if len(asc) < 5:
            return None
        rate = ((b1 & 0x7F) << 17) | (asc[2] << 9) | (asc[3] << 1) | (asc[4] >> 7)
        chan = (asc[4] >> 3) & 0x0F
    elif freq_idx < len(AAC_SAMPLE_RATES):
        rate = AAC_SAMPLE_RATES[freq_idx]
        chan = (b1 >> 3) & 0x0F
    else:
        return None
    if not (1 <= chan <= 7) or rate <= 0:
        return None
    return {"object_type": object_type, "sample_rate": rate, "channels": chan}


def _read_descriptor(buf: bytes, pos: int, end: int):
    """(tag, body_start, body_end, next_pos) for one MPEG-4
    BaseDescriptor with expandable size (up to 4 length bytes, 0x80
    continuation), or None when malformed/out of bounds."""
    if pos + 2 > end:
        return None
    tag = buf[pos]
    size = 0
    p = pos + 1
    for _ in range(4):
        if p >= end:
            return None
        b = buf[p]
        p += 1
        size = (size << 7) | (b & 0x7F)
        if not b & 0x80:
            break
    else:
        return None
    if p + size > end:
        return None
    return tag, p, p + size, p + size


def _esds_audio(buf: bytes, off: int, end: int) -> dict | None:
    """Descend esds → ES_Descriptor(3) → DecoderConfigDescriptor(4) →
    DecSpecificInfo(5) and parse the AudioSpecificConfig. Strict: every
    descriptor header must land inside its parent."""
    if end - off < 4:
        return None
    d = _read_descriptor(buf, off + 4, end)  # skip esds version/flags
    if d is None or d[0] != 0x03:
        return None
    _, es_start, es_end, _ = d
    if es_end - es_start < 3:
        return None
    flags = buf[es_start + 2]
    p = es_start + 3
    if flags & 0x80:  # streamDependenceFlag → dependsOn_ES_ID
        p += 2
    if flags & 0x40:  # URL_Flag → URLlength + URLstring
        if p >= es_end:
            return None
        p += 1 + buf[p]
    if flags & 0x20:  # OCRstreamFlag → OCR_ES_Id
        p += 2
    while p < es_end:
        d = _read_descriptor(buf, p, es_end)
        if d is None:
            return None
        tag, b_start, b_end, p = d
        if tag != 0x04:
            continue
        if b_end - b_start < 13:
            return None
        q = b_start + 13  # OTI(1) streamType(1) bufferSize(3) rates(8)
        while q < b_end:
            d2 = _read_descriptor(buf, q, b_end)
            if d2 is None:
                return None
            tag2, a_start, a_end, q = d2
            if tag2 == 0x05:
                return parse_audio_specific_config(buf[a_start:a_end])
        return None
    return None


def _minf_audio(data: bytes, walk, off: int, end: int) -> dict | None:
    """minf → stbl → stsd → first `mp4a` AudioSampleEntry → esds → ASC.
    Audio metadata is an optional enrichment: any malformation on this
    path yields None (no audio key) rather than failing the whole parse —
    the box walk's strictness already validated the container skeleton."""
    for st, soff, send in walk(data, off, end):
        if st != b"stbl":
            continue
        for bt, boff, bend in walk(data, soff, send):
            if bt != b"stsd" or bend - boff < 8:
                continue
            for et, eoff, eend in walk(data, boff + 8, bend):
                if et != b"mp4a" or eend - eoff < 28:
                    continue
                for ct, coff, cend in walk(data, eoff + 28, eend):
                    if ct == b"esds":
                        return _esds_audio(data, coff, cend)
    return None


def parse_mp4(data: bytes) -> dict | None:
    """Strict ISO-BMFF walk: the payload must start with a well-formed
    `ftyp` box and every top-level box size must land exactly inside the
    buffer; `moov` must hold an `mvhd`. Returns {"brand", "duration_ms",
    "tracks": [(handler, width, height), ...]} or None; when a track
    carries an `mp4a` sample entry whose esds parses, an "audio" key
    adds {"object_type", "sample_rate", "channels"} from its
    AudioSpecificConfig (the first such track wins)."""
    if len(data) < 16:
        return None

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", buf, pos)
            btype = buf[pos + 4 : pos + 8]
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    return
                (size,) = struct.unpack_from(">Q", buf, pos + 8)
                body_off = pos + 16
            else:
                body_off = pos + 8
            if size < body_off - pos or pos + size > end:
                return
            yield btype, body_off, pos + size
            pos += size
        if pos != end:
            yield None, pos, end  # trailing garbage marker

    top = list(walk(data, 0, len(data)))
    if not top or any(t[0] is None for t in top):
        return None
    if top[0][0] != b"ftyp" or top[0][2] - top[0][1] < 8:
        return None
    brand = data[top[0][1] : top[0][1] + 4].decode("ascii", "replace")
    duration_ms = None
    tracks: list[tuple[str, int, int]] = []
    audio: dict | None = None
    for btype, boff, bend in top:
        if btype != b"moov":
            continue
        inner = list(walk(data, boff, bend))
        if any(t[0] is None for t in inner):
            return None
        for ityp, ioff, iend in inner:
            if ityp == b"mvhd":
                if iend - ioff < 20:
                    return None
                version = data[ioff]
                if version == 0:
                    _, _, timescale, dur = struct.unpack_from(
                        ">IIII", data, ioff + 4
                    )
                else:
                    if iend - ioff < 32:
                        return None
                    _, _, timescale, dur = struct.unpack_from(
                        ">QQIQ", data, ioff + 4
                    )
                if timescale == 0:
                    return None
                duration_ms = dur * 1000.0 / timescale
            elif ityp == b"trak":
                t = list(walk(data, ioff, iend))
                if any(x[0] is None for x in t):
                    return None
                width = height = 0
                handler = None
                for tt, toff, tend in t:
                    if tt == b"tkhd" and tend - toff >= 84:
                        w16, h16 = struct.unpack_from(">II", data, tend - 8)
                        width, height = w16 >> 16, h16 >> 16
                    elif tt == b"mdia":
                        for mt, moff, mend in walk(data, toff, tend):
                            if mt is None:
                                return None
                            if mt == b"hdlr" and mend - moff >= 12:
                                handler = data[moff + 8 : moff + 12].decode(
                                    "ascii", "replace"
                                )
                            elif mt == b"minf" and audio is None:
                                audio = _minf_audio(data, walk, moff, mend)
                if handler is None:
                    return None
                tracks.append((handler, width, height))
    if duration_ms is None:
        return None
    out = {"brand": brand, "duration_ms": duration_ms, "tracks": tracks}
    if audio is not None:
        out["audio"] = audio
    return out


# --- OGG (RFC 3533) ----------------------------------------------------------


def _ogg_crc_table():
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        table.append(r)
    return table


_OGG_CRC = None


def _ogg_crc(data: bytes) -> int:
    """OGG page CRC: unreflected CRC-32 with poly 0x04C11DB7, init 0."""
    global _OGG_CRC
    if _OGG_CRC is None:
        _OGG_CRC = _ogg_crc_table()
    crc = 0
    for b in data:
        crc = ((crc << 8) ^ _OGG_CRC[((crc >> 24) & 0xFF) ^ b]) & 0xFFFFFFFF
    return crc


def ogg_build(serial: int, packets: list[bytes], granules: list[int]) -> bytes:
    """One logical stream: packet k on its own page with granule position
    granules[k]; first page flagged beginning-of-stream, last end-of-stream.
    Packets longer than 255·255 bytes are out of scope (single-page lacing
    only)."""
    out = bytearray()
    for k, (pkt, gran) in enumerate(zip(packets, granules)):
        lacing = []
        rest = len(pkt)
        while rest >= 255:
            lacing.append(255)
            rest -= 255
        lacing.append(rest)
        htype = (0x02 if k == 0 else 0) | (
            0x04 if k == len(packets) - 1 else 0
        )
        header = (
            b"OggS"
            + bytes([0, htype])
            + struct.pack("<qIII", gran, serial, k, 0)
            + bytes([len(lacing)])
            + bytes(lacing)
        )
        crc = _ogg_crc(header + pkt)
        page = bytearray(header + pkt)
        struct.pack_into("<I", page, 22, crc)
        out += page
    return bytes(out)


def parse_ogg(data: bytes) -> dict | None:
    """Strict OGG page walk with per-page CRC validation. Returns
    {"n_pages", "serials", "last_granule", "bos_packets"} or None.
    `last_granule` is the maximum granule position over final pages per
    stream — the codec-units duration counter. `bos_packets` maps each
    stream serial to the first packet of its beginning-of-stream page:
    the codec id header, whose fixed fields (e.g. Vorbis channels +
    sample rate via `parse_vorbis_id`) parse without any entropy
    decoding — and with the rate known, granules convert to seconds."""
    if len(data) < 27 or data[:4] != b"OggS":
        return None
    pos = 0
    n_pages = 0
    serials: set[int] = set()
    last_granule: dict[int, int] = {}
    bos_packets: dict[int, bytes] = {}
    while pos < len(data):
        if pos + 27 > len(data) or data[pos : pos + 4] != b"OggS":
            return None
        version, htype = data[pos + 4], data[pos + 5]
        if version != 0:
            return None
        gran, serial, seq, crc = struct.unpack_from("<qIII", data, pos + 6)
        nseg = data[pos + 26]
        if pos + 27 + nseg > len(data):
            return None
        lacing = data[pos + 27 : pos + 27 + nseg]
        body_len = sum(lacing)
        body_off = pos + 27 + nseg
        if body_off + body_len > len(data):
            return None
        page = bytearray(data[pos : body_off + body_len])
        struct.pack_into("<I", page, 22, 0)
        if _ogg_crc(bytes(page)) != crc:
            return None
        n_pages += 1
        serials.add(serial)
        if gran >= 0:
            last_granule[serial] = max(last_granule.get(serial, 0), gran)
        # beginning-of-stream page: its first packet is the codec's id
        # header (Vorbis/Opus/...) — capture it so header-level metadata
        # (e.g. `parse_vorbis_id`) is reachable without decoding audio.
        # A final lacing value of 255 means the packet continues on the
        # next page (multi-page headers are out of this demux's scope,
        # like the builder); skip capture rather than truncate.
        if htype & 0x02 and serial not in bos_packets and nseg:
            first_len = 0
            for lv in lacing:
                first_len += lv
                if lv < 255:
                    break
            else:
                first_len = -1  # packet spans pages
            if first_len >= 0:
                bos_packets[serial] = data[body_off : body_off + first_len]
        pos = body_off + body_len
    return {
        "n_pages": n_pages,
        "serials": sorted(serials),
        "last_granule": max(last_granule.values()) if last_granule else None,
        "bos_packets": bos_packets,
    }


# --- Vorbis I identification header (inside OGG pages) -----------------------

def vorbis_id_packet(
    channels: int,
    sample_rate: int,
    bitrate_nominal: int = 0,
    blocksize_exp: tuple[int, int] = (8, 11),
) -> bytes:
    """Vorbis I identification header (spec §4.2.2): the 30-byte first
    packet of every Vorbis stream. This is CONTAINER-ADJACENT metadata —
    plain little-endian fields, no entropy coding — so parsing it is
    stdlib-feasible and moves the stub boundary one honest notch: with
    audio_sample_rate known, the OGG granule position (PCM sample count
    for Vorbis) converts to seconds. The comment/setup headers and the
    audio packets stay stubbed (they need the full codebook machinery)."""
    b0, b1 = blocksize_exp
    if not (6 <= b0 <= b1 <= 13):
        raise ValueError(f"blocksize exponents out of spec: {blocksize_exp}")
    if not (1 <= channels <= 255) or sample_rate <= 0:
        raise ValueError(f"bad channels/rate: {channels}/{sample_rate}")
    return (
        b"\x01vorbis"
        + struct.pack(
            "<IBIiii",
            0,                # vorbis_version
            channels,
            sample_rate,
            0,                # bitrate_maximum
            bitrate_nominal,
            0,                # bitrate_minimum
        )
        + bytes([(b1 << 4) | b0, 0x01])  # blocksizes + framing flag
    )


def parse_vorbis_id(packet: bytes) -> dict | None:
    """Strict Vorbis I identification-header parse. Returns
    {"channels", "sample_rate", "bitrate_nominal"} or None when the
    packet is not a spec-valid id header (wrong magic/version, zero
    channels/rate, out-of-range or misordered blocksizes, framing bit
    unset — §4.2.2 says each check MUST reject the stream)."""
    if len(packet) < 30 or packet[:7] != b"\x01vorbis":
        return None
    version, channels, rate, br_max, br_nom, br_min = struct.unpack_from(
        "<IBIiii", packet, 7
    )
    if version != 0 or channels == 0 or rate == 0:
        return None
    bs = packet[28]
    b0, b1 = bs & 0x0F, bs >> 4
    if not (6 <= b0 <= b1 <= 13):
        return None
    if not packet[29] & 0x01:  # framing flag
        return None
    return {
        "channels": channels,
        "sample_rate": rate,
        "bitrate_nominal": br_nom,
    }
