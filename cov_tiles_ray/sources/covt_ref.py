"""Reader for the reference's checked-in ``.covt`` golden fixtures.

The ~130 goldens under ``test/fixtures/*/covt`` were written by an earlier
revision of the reference converter whose wire layout is self-describing
(empirically pinned against all 92 OMT files — the metadata walk lands
exactly at EOF):

    header   : version (varint) | numLayers (varint)
    layer    : name (string) | extent (varint) | numFeatures (varint)
             | numColumns (varint) | column[]... | stream data in metadata order
    column   : name (string) | dataType (byte, OLD enum: STRING=0 FLOAT=1
               DOUBLE=2 INT_64=3 UINT_64=4 BOOLEAN=5 GEOMETRY=6)
             | columnType (byte: PLAIN=0 DICTIONARY=1 LOCALIZED_DICTIONARY=2
               ICE=3 ICE_MORTON=4) | numStreams (varint)
    stream   : name (string) | numValues (varint) | byteLength (varint)
             | encoding (byte: PLAIN=0 VARINT=1 VARINT_ZIG_ZAG=2
               VARINT_DELTA=3 VARINT_DELTA_ZIG_ZAG=4 RLE=5 BOOLEAN_RLE=6
               BYTE_RLE=7 FAST_PFOR_DELTA=8 FAST_PFOR_DELTA_ZIG_ZAG=9)

Stream payloads follow the layer's column metadata block, in metadata
order.  Numeric RLE is ORC RLE v1 (unsigned base varints,
evaluation/ConversionUtils.java:186-201); FastPFOR streams are the public
JavaFastPFOR ``Composition(FastPFOR(), VariableByte())`` layout serialized
as big-endian u32 words (EncodingUtils.java:149-188).  Morton vertex
dictionaries use numBits = extent.bit_length() with a +2^(numBits-2)
positive shift (GeometryUtils.java:23-40).

Clean-room: layouts derived from the reference's decoders
(decoder/CovtParser.java, parser/js/src/decoder/covtDecoder.ts) and the
fixture bytes themselves; all array kernels are vectorized numpy with no
counterpart in the reference.
"""

from __future__ import annotations

import numpy as np

from ..functions import codecs as C
from ..model.format import ColumnDataType, GeometryType, LayerData, PropertyColumn

I64 = np.int64
U32 = np.uint32

# --- old-layout enum values (differ from the engine's COVT-R enums) -------
_DT_STRING, _DT_FLOAT, _DT_DOUBLE, _DT_INT64, _DT_UINT64, _DT_BOOL, _DT_GEOM = range(7)
_CT_PLAIN, _CT_DICT, _CT_LOCALIZED, _CT_ICE, _CT_ICE_MORTON = range(5)
(
    _ENC_PLAIN,
    _ENC_VARINT,
    _ENC_VARINT_ZZ,
    _ENC_VARINT_DELTA,
    _ENC_VARINT_DELTA_ZZ,
    _ENC_RLE,
    _ENC_BOOL_RLE,
    _ENC_BYTE_RLE,
    _ENC_FASTPFOR_DELTA,
    _ENC_FASTPFOR_DELTA_ZZ,
) = range(10)

_OLD_DT = {
    _DT_STRING: ColumnDataType.STRING,
    _DT_FLOAT: ColumnDataType.FLOAT,
    _DT_DOUBLE: ColumnDataType.DOUBLE,
    _DT_INT64: ColumnDataType.INT_64,
    _DT_UINT64: ColumnDataType.UINT_64,
    _DT_BOOL: ColumnDataType.BOOLEAN,
}


# ---------------------------------------------------------------------------
# JavaFastPFOR-compatible decoder: Composition(FastPFOR(), VariableByte())
# ---------------------------------------------------------------------------

_FPF_BLOCK = 256  # me.lemire FastPFOR BLOCK_SIZE
_FPF_PAGE = 65536


def _packed_words(count: int, b: int) -> int:
    return (count * b + 31) >> 5


def _unpack_bits(words: np.ndarray, b: int, count: int) -> np.ndarray:
    """Unpack ``count`` tightly bit-packed b-bit values (value j occupies
    bits [j*b, (j+1)*b) LSB-first across the u32 word sequence — the
    goldens' layout for both block data and exception arrays, pinned
    empirically; 256-value blocks make this identical to 32-value-group
    fastpack)."""
    if b == 0:
        return np.zeros(count, dtype=U32)
    if b == 32:
        return words[:count].copy()
    w = np.concatenate([words[: _packed_words(count, b)], np.zeros(1, dtype=U32)])
    bitpos = np.arange(count, dtype=np.int64) * b
    wi = bitpos >> 5
    sh = (bitpos & 31).astype(U32)
    lo = w[wi] >> sh
    spill = sh.astype(np.int64) + b > 32
    hi = np.zeros(count, dtype=U32)
    hi[spill] = w[wi[spill] + 1] << (U32(32) - sh[spill])
    return (lo | hi) & U32((1 << b) - 1)


def _decode_fastpfor_ints(raw: bytes, num_values: int) -> np.ndarray:
    """Decode a Composition(FastPFOR, VariableByte) stream stored as
    big-endian u32 words -> uint32 values (the pre-delta/zigzag ints)."""
    if len(raw) % 4 != 0:
        # unpadded byte-level VariableByte (ByteIntegerCODEC path): raw
        # bytes in natural order, no word packing
        return _variable_byte(np.frombuffer(raw, dtype=np.uint8), num_values)
    ints = np.frombuffer(raw, dtype=">u4").astype(U32)
    got = 0
    pos = 0
    # Short streams (< one 256-block): SOME golden generations write a zero
    # count word before the VariableByte payload, others omit it entirely.
    # ints[0]==0 *usually* means the count word is present, but it is NOT
    # unambiguous: a count-word-less VB stream whose first value is a
    # multiple of 2^28 also starts with four zero bytes (ADVICE r2) — so
    # when the skip-count-word parse comes up short we retry from word 0.
    skipped_ambiguous_zero_word = False
    if len(ints) and num_values < _FPF_BLOCK:
        fp_count = 0
        if int(ints[0]) == 0:
            pos = 1
            skipped_ambiguous_zero_word = True
    else:
        fp_count = int(ints[0]) if len(ints) else 0
    # the encoder may have compressed more values than the stream's recorded
    # numValues (padding); allocate for the larger and truncate at return
    out = np.empty(max(num_values, fp_count), dtype=U32)
    if fp_count:
        pos = 1
        remaining = fp_count
        while remaining > 0:
            thissize = min(_FPF_PAGE, remaining)
            pos = _decode_fpf_page(ints, pos, out, got, thissize, raw)
            got += thissize
            remaining -= thissize
    if got < num_values:
        need = num_values - got
        vals = _decode_vb_tail(raw, ints, pos, need)
        if len(vals) < need and skipped_ambiguous_zero_word:
            # the leading zero word was actually the first four bytes of a
            # count-word-less VB value (multiple of 2^28): reparse from 0
            alt = _decode_vb_tail(raw, ints, 0, need)
            if len(alt) > len(vals):
                vals = alt
        out[got : got + len(vals)] = vals
        got += len(vals)
    if got < num_values:
        raise ValueError(f"FastPFOR stream produced {got} of {num_values} values")
    return out[:num_values]


def _decode_vb_tail(raw: bytes, ints: np.ndarray, pos: int, need: int) -> np.ndarray:
    """VariableByte tail fallback ladder, best-effort from word ``pos``:
    (1) bytes little-endian within each u32 word, set high bit TERMINATES a
    value (inverted continuation — the JavaFastPFOR convention); (2) bytes
    in natural order (ByteIntegerCODEC writer); (3) plain LEB128 varints
    (continuation high bit) under the FastPFOR label.  Returns the longest
    prefix any strategy produced (callers check length vs ``need``)."""
    tail = np.frombuffer(ints[pos:].astype("<u4").tobytes(), dtype=np.uint8)
    vals = _variable_byte(tail, need)
    if len(vals) < need:
        natural = np.frombuffer(raw, dtype=np.uint8)[pos * 4 :]
        alt = _variable_byte(natural, need)
        if len(alt) > len(vals):
            vals = alt
    if len(vals) < need:
        natural = np.frombuffer(raw, dtype=np.uint8)[pos * 4 :]
        if int((natural < 0x80).sum()) >= need:
            leb, _ = C.decode_varint(natural, need, 0)
            vals = leb.astype(U32)
    return vals


def _variable_byte(tb: np.ndarray, max_values: int) -> np.ndarray:
    """lemire VariableByte: 7-bit groups LSB-first, set high bit TERMINATES
    a value (inverted continuation)."""
    out = np.empty(max_values, dtype=U32)
    got = 0
    v = 0
    shift = 0
    for byte in tb:
        v |= (int(byte) & 0x7F) << shift
        if byte & 0x80:
            out[got] = v & 0xFFFFFFFF
            got += 1
            v = 0
            shift = 0
            if got == max_values:
                break
        else:
            shift += 7
    return out[:got]


def _decode_fpf_page(ints: np.ndarray, pos: int, out: np.ndarray, outpos: int, thissize: int, raw: bytes) -> int:
    initpos = pos
    wheremeta = int(ints[pos])
    pos += 1
    inexcept = initpos + wheremeta
    bytesize = int(ints[inexcept])  # unpadded container size
    inexcept += 1
    # metadata byte container: serialized little-endian per u32 word (the
    # Java ByteBuffer->IntBuffer->big-endian-write round trip nets a
    # per-word byte reversal — pinned empirically against the OMT goldens)
    nwords = (bytesize + 3) // 4
    meta = np.frombuffer(
        ints[inexcept : inexcept + nwords].astype("<u4").tobytes(), dtype=np.uint8
    )[:bytesize]
    inexcept += nwords
    bitmap = int(ints[inexcept])
    inexcept += 1
    packed_ex: dict[int, np.ndarray] = {}
    for k in range(2, 33):
        if bitmap & (1 << (k - 1)):
            size = int(ints[inexcept])
            inexcept += 1
            nw = _packed_words(size, k)
            packed_ex[k] = _unpack_bits(ints[inexcept : inexcept + nw], k, size)
            inexcept += nw
    ex_ptr = dict.fromkeys(packed_ex, 0)

    mp = 0  # cursor into meta bytes
    tmpinpos = initpos + 1
    nblocks = thissize // _FPF_BLOCK
    for blk in range(nblocks):
        b = int(meta[mp])
        cexcept = int(meta[mp + 1])
        mp += 2
        vals = _unpack_bits(ints[tmpinpos : tmpinpos + (_FPF_BLOCK // 32) * b], b, _FPF_BLOCK)
        tmpinpos += (_FPF_BLOCK // 32) * b
        if cexcept > 0:
            maxbits = int(meta[mp])
            mp += 1
            index = maxbits - b
            positions = meta[mp : mp + cexcept].astype(np.int64)
            mp += cexcept
            if index == 1:
                vals[positions] |= U32(1) << U32(b)
            else:
                p0 = ex_ptr[index]
                exvals = packed_ex[index][p0 : p0 + cexcept]
                ex_ptr[index] = p0 + cexcept
                vals[positions] |= exvals << U32(b)
        out[outpos + blk * _FPF_BLOCK : outpos + (blk + 1) * _FPF_BLOCK] = vals
    return inexcept


def _unzigzag32(u: np.ndarray) -> np.ndarray:
    u = u.astype(U32, copy=False)
    return ((u >> U32(1)).astype(np.int64)) ^ -((u & U32(1)).astype(np.int64))


def decode_fastpfor_delta_zigzag(raw: bytes, num_values: int) -> np.ndarray:
    return np.cumsum(_unzigzag32(_decode_fastpfor_ints(raw, num_values)), dtype=I64)


def decode_fastpfor_delta(raw: bytes, num_values: int) -> np.ndarray:
    return np.cumsum(_decode_fastpfor_ints(raw, num_values).astype(I64), dtype=I64)


# ---------------------------------------------------------------------------
# stream decode dispatch
# ---------------------------------------------------------------------------


def _rle_v1_tolerant(b: np.ndarray, pos: int, n: int, signed: bool = False) -> np.ndarray:
    """ORC RLE v1 ints, tolerant of the final group overshooting ``n``
    (RunLengthIntegerReader consumes lazily; a trailing run may cover more
    values than the stream's numValues).  ``signed`` -> zigzag varints for
    base/literal values, per the ORC v1 signed variant."""
    if n == 0:
        return np.zeros(0, dtype=I64)
    chunks: list[np.ndarray] = []
    got = 0
    while got < n:
        header = int(b[pos])
        pos += 1
        if header <= 0x7F:
            num = header + 3
            delta = int(np.int8(b[pos]))
            pos += 1
            base, pos = C.decode_varint(b, 1, pos)
            base = zz_to_signed(base)[0] if signed else base.view(I64)[0]
            chunks.append(int(base) + delta * np.arange(num, dtype=I64))
        else:
            num = 256 - header
            vals, pos = C.decode_varint(b, num, pos)
            chunks.append(zz_to_signed(vals) if signed else vals.view(I64))
        got += num
    return np.concatenate(chunks)[:n]


def _byte_rle_tolerant(b: np.ndarray, pos: int, n: int) -> np.ndarray:
    chunks: list[np.ndarray] = []
    got = 0
    while got < n:
        header = int(b[pos])
        pos += 1
        if header <= 0x7F:
            num = header + 3
            chunks.append(np.full(num, b[pos], dtype=np.uint8))
            pos += 1
        else:
            num = 256 - header
            chunks.append(np.asarray(b[pos : pos + num], dtype=np.uint8))
            pos += num
        got += num
    return np.concatenate(chunks)[:n]


def _decode_int_stream(
    buf: np.ndarray, pos: int, nv: int, bl: int, enc: int, signed: bool = False
) -> np.ndarray:
    if enc == _ENC_RLE:
        return _rle_v1_tolerant(buf, pos, nv, signed=signed)
    if enc == _ENC_VARINT:
        vals, _ = C.decode_varint(buf, nv, pos)
        return vals.view(I64)
    if enc == _ENC_VARINT_ZZ:
        vals, _ = C.decode_varint_zigzag(buf, nv, pos)
        return vals
    if enc == _ENC_VARINT_DELTA:
        vals, _ = C.decode_varint(buf, nv, pos)
        return np.cumsum(vals.view(I64), dtype=I64)
    if enc == _ENC_VARINT_DELTA_ZZ:
        vals, _ = C.decode_varint_delta_zigzag(buf, nv, pos)
        return vals
    if enc == _ENC_FASTPFOR_DELTA_ZZ:
        return decode_fastpfor_delta_zigzag(buf[pos : pos + bl].tobytes(), nv)
    if enc == _ENC_FASTPFOR_DELTA:
        return decode_fastpfor_delta(buf[pos : pos + bl].tobytes(), nv)
    raise ValueError(f"unsupported int stream encoding {enc}")


# ---------------------------------------------------------------------------
# file parsing
# ---------------------------------------------------------------------------


def _read_varint(b: np.ndarray, p: int) -> tuple[int, int]:
    v = 0
    s = 0
    while True:
        byte = int(b[p])
        p += 1
        v |= (byte & 0x7F) << s
        if not byte & 0x80:
            return v, p
        s += 7


def _read_string(b: np.ndarray, p: int) -> tuple[str, int]:
    n, p = _read_varint(b, p)
    return bytes(b[p : p + n]).decode("utf-8"), p + n


def _morton_raw(codes: np.ndarray, num_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Deinterleave: even bits -> x, odd bits -> y (GeometryUtils.java:34-48)."""
    c = codes.astype(np.uint64)
    x = np.zeros(len(c), dtype=I64)
    y = np.zeros(len(c), dtype=I64)
    for i in range(num_bits):
        x |= ((c >> np.uint64(2 * i)) & np.uint64(1)).astype(I64) << i
        y |= ((c >> np.uint64(2 * i + 1)) & np.uint64(1)).astype(I64) << i
    return x, y


def _morton_decode_auto(codes: np.ndarray, num_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Two negative-coordinate conventions exist across golden generations:
    a positive shift of 2^(num_bits-2) (GeometryUtils.java:23-31) and plain
    two's-complement truncation to num_bits (coords mod 2^n).  Decode both
    and keep the one with the more compact coordinate cloud — the wrong
    convention displaces every vertex by +-2^(num_bits-2) or more."""
    rx, ry = _morton_raw(codes, num_bits)
    shift = 1 << (num_bits - 2) if num_bits >= 2 else 0
    half = 1 << (num_bits - 1)
    full = 1 << num_bits
    # shift-written raw values cluster in the middle band
    # [2^(n-2), 3*2^(n-2)); wrap-written ones sit near 0 (positive coords)
    # and near 2^n (negative coords).  Majority vote over both axes decides.
    raw = np.concatenate([rx, ry])
    mid = int(((raw >= shift) & (raw < 3 * shift)).sum())
    edge = len(raw) - mid
    if mid >= edge:
        return rx - shift, ry - shift
    wx = np.where(rx >= half, rx - full, rx)
    wy = np.where(ry >= half, ry - full, ry)
    return wx, wy


def _parse_metadata_a(b: np.ndarray, p: int):
    """Layout A: extent present; stream = (name, numValues, byteLength,
    encoding byte)."""
    name, p = _read_string(b, p)
    extent, p = _read_varint(b, p)
    nfeat, p = _read_varint(b, p)
    ncols, p = _read_varint(b, p)
    cols = []
    for _c in range(ncols):
        cname, p = _read_string(b, p)
        dt = int(b[p])
        ct = int(b[p + 1])
        p += 2
        ns, p = _read_varint(b, p)
        streams = []
        for _s in range(ns):
            sname, p = _read_string(b, p)
            nv, p = _read_varint(b, p)
            bl, p = _read_varint(b, p)
            enc = int(b[p])
            p += 1
            if sname == "vertex_buffer" and ct == _CT_ICE:
                # ICE dictionaries record numValues as VERTICES; normalize
                # to ints (2 per vertex) so decode paths are uniform
                nv *= 2
            streams.append((sname, nv, bl, enc))
        cols.append((cname, dt, ct, streams))
    return name, extent, nfeat, cols, p


# TS ColumnEncoding ordinals (parser/js/src/decoder/covtMetadata.ts)
_TS_ENC_VARINT = 1
_TS_ENC_DELTA_VARINT = 2
_TS_ENC_RLE = 3
_TS_ENC_DICTIONARY = 6
_TS_ENC_LOCALIZED = 7


def _parse_metadata_b(b: np.ndarray, p: int):
    """Layout B (TS covtDecoder.ts format): no extent; column carries ONE
    encoding byte; stream = (name, numValues, byteLength).  Normalized into
    layout-A column tuples by assigning per-stream encodings from the
    column encoding + stream role."""
    name, p = _read_string(b, p)
    nfeat, p = _read_varint(b, p)
    ncols, p = _read_varint(b, p)
    cols = []
    for _c in range(ncols):
        cname, p = _read_string(b, p)
        dt = int(b[p])
        colenc = int(b[p + 1])
        p += 2
        ns, p = _read_varint(b, p)
        raw_streams = []
        for _s in range(ns):
            sname, p = _read_string(b, p)
            nv, p = _read_varint(b, p)
            bl, p = _read_varint(b, p)
            raw_streams.append((sname, nv, bl))
        snames = {s[0] for s in raw_streams}
        if cname == "geometry":
            ct = _CT_ICE if "vertex_offsets" in snames else _CT_PLAIN
        elif any(s.startswith("present_") for s in snames):
            ct = _CT_LOCALIZED
        elif "dictionary" in snames:
            ct = _CT_DICT
        else:
            ct = _CT_PLAIN
        streams = []
        for sname, nv, bl in raw_streams:
            if sname == "vertex_buffer":
                nv *= 2  # layout B records vertices; normalize to ints
            if sname == "geometry_types":
                enc = _ENC_BYTE_RLE
            elif sname in ("geometry_offsets", "part_offsets", "ring_offsets"):
                enc = _ENC_RLE
            elif sname in ("vertex_offsets", "vertex_buffer"):
                enc = _ENC_VARINT_DELTA_ZZ
            elif sname == "dictionary":
                enc = _ENC_PLAIN
            elif sname.startswith("present"):
                enc = _ENC_BOOL_RLE
            elif cname == "id":
                enc = (
                    _ENC_VARINT_DELTA_ZZ
                    if colenc == _TS_ENC_DELTA_VARINT
                    else _ENC_RLE
                )
            elif colenc == _TS_ENC_VARINT:
                enc = _ENC_VARINT_ZZ if dt == _DT_INT64 else _ENC_VARINT
            else:
                enc = _ENC_RLE
            streams.append((sname, nv, bl, enc))
        cols.append((cname, dt, ct, streams))
    return name, 4096, nfeat, cols, p


def _detect_layout(b: np.ndarray) -> str:
    """Walk the whole file under each metadata layout; the one whose walk
    lands exactly at EOF wins (both layouts are self-describing, so a full
    consistency check is cheap and unambiguous)."""
    for label, parse in (("a", _parse_metadata_a), ("b", _parse_metadata_b)):
        try:
            p = 0
            _v, p = _read_varint(b, p)
            nl, p = _read_varint(b, p)
            for _ in range(nl):
                _n, _e, _f, cols, p = parse(b, p)
                p += sum(s[2] for _, _, _, streams in cols for s in streams)
            if p == len(b):
                return label
        except Exception:
            continue
    # the reference's CURRENT (new) layout: no file header, layers start
    # with a version<<1|opt byte — the framing walk landing exactly at EOF
    # is the same unambiguous consistency check (plain-metadata files only;
    # optimized metadata needs the TileJSON sidecar, use parse_new_covt)
    try:
        from .covt_new import walk_new_metadata

        walk = walk_new_metadata(bytes(b))
        if walk and walk[-1]["layer_end"] == len(b):
            return "new"
    except Exception:
        pass
    raise ValueError("not a recognized reference .covt layout")


def parse_ref_covt(buf: bytes) -> list[LayerData]:
    """Decode a reference-layout .covt golden into the engine's LayerData.

    Handles all three reference generations: layout A (extent + per-stream
    encoding bytes, test/fixtures/omt et al.), layout B (TS covtDecoder
    format, parser/js/data + a few older fixtures), and the CURRENT new
    layout (CovtParser.decodeCovt framing; plain metadata — optimized
    files need ``covt_new.parse_new_covt`` with the TileJSON sidecar)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    layout = _detect_layout(b)
    if layout == "new":
        from .covt_new import parse_new_covt

        return parse_new_covt(bytes(buf))
    parse = _parse_metadata_a if layout == "a" else _parse_metadata_b
    p = 0
    _version, p = _read_varint(b, p)
    num_layers, p = _read_varint(b, p)
    layers: list[LayerData] = []
    for _ in range(num_layers):
        name, extent, nfeat, cols, p = parse(b, p)
        layer, p = _decode_layer_data(b, p, name, extent, nfeat, cols, per_part_reset=layout == "b")
        layers.append(layer)
    return layers


def _decode_layer_data(b, p, name, extent, nfeat, cols, per_part_reset=False):
    ids = None
    geom: dict = {}
    props: dict[str, PropertyColumn] = {}
    for cname, dt, ct, streams in cols:
        if cname == "id":
            (sname, nv, bl, enc) = streams[0]
            ids = _decode_int_stream(b, p, nv, bl, enc).astype(np.uint64)
            p += bl
        elif cname == "geometry":
            geom, p = _decode_geometry(b, p, extent, ct, streams, per_part_reset=per_part_reset)
        elif ct == _CT_LOCALIZED:
            p = _decode_localized(b, p, cname, nfeat, streams, props)
        else:
            p = _decode_property(b, p, cname, dt, ct, nfeat, streams, props)
    _strip_closing_vertices(geom)
    return (
        LayerData(
            name=name,
            extent=extent,
            geometry_types=geom["types"],
            vertex_buffer=geom["vertex_buffer"],
            geometry_offsets=geom.get("geometry_offsets"),
            part_offsets=geom.get("part_offsets"),
            ring_offsets=geom.get("ring_offsets"),
            ids=ids,
            properties=props,
        ),
        p,
    )


def _strip_closing_vertices(geom: dict) -> None:
    """Some golden generations keep the SFA closing vertex in polygon rings
    (the writer's removeClosingPolygonVertex flag varied); the engine's
    LayerData convention drops it.  Detect per layer: when EVERY ring's
    last vertex equals its first, strip one vertex per ring."""
    ro = geom.get("ring_offsets")
    if ro is None or len(ro) == 0:
        return
    gt = geom["types"]
    vb = geom["vertex_buffer"]
    part_lens = _part_lengths(geom)
    ends = np.cumsum(part_lens)
    starts = ends - part_lens
    # which parts are polygon rings (vs linestring parts)?  rebuild the
    # boundary walk: rings are the parts contributed by POLYGON/MULTIPOLYGON
    is_ring = np.zeros(len(part_lens), dtype=bool)
    gi = pi = 0
    go = geom.get("geometry_offsets")
    po = geom.get("part_offsets")
    idx = 0
    for t in gt:
        t = int(t)
        if t == GeometryType.POINT:
            idx += 1
        elif t == GeometryType.MULTIPOINT:
            idx += int(go[gi]); gi += 1
        elif t == GeometryType.LINESTRING:
            idx += 1; pi += 1
        elif t == GeometryType.MULTILINESTRING:
            n = int(go[gi]); gi += 1
            idx += n; pi += n
        elif t == GeometryType.POLYGON:
            nr = int(po[pi]); pi += 1
            is_ring[idx : idx + nr] = True
            idx += nr
        else:
            npoly = int(go[gi]); gi += 1
            for _ in range(npoly):
                nr = int(po[pi]); pi += 1
                is_ring[idx : idx + nr] = True
                idx += nr
    rings = np.flatnonzero(is_ring)
    if len(rings) == 0:
        return
    rs, re = starts[rings], ends[rings]
    closed = (
        (part_lens[rings] >= 4)
        & (vb[2 * rs] == vb[2 * re - 2])
        & (vb[2 * rs + 1] == vb[2 * re - 1])
    )
    if not closed.all():
        return
    keep = np.ones(len(vb) // 2, dtype=bool)
    keep[re - 1] = False
    vb2 = vb.reshape(-1, 2)[keep].reshape(-1)
    geom["vertex_buffer"] = vb2
    geom["ring_offsets"] = np.asarray(geom["ring_offsets"], dtype=np.int64) - 1


_GEOM_PAYLOAD_ORDER = (
    "geometry_types",
    "geometry_offsets",
    "part_offsets",
    "ring_offsets",
    "vertex_offsets",
    "vertex_buffer",
)


def _decode_geometry(b, p, extent, ct, streams, per_part_reset=False):
    # Stream PAYLOADS are written in logical decode order regardless of the
    # metadata list order (ICE columns list vertex streams first in metadata
    # but their bytes still follow the topology streams).
    meta = {sname: (nv, bl, enc) for sname, nv, bl, enc in streams}
    smap = {}
    for sname in _GEOM_PAYLOAD_ORDER:
        if sname in meta:
            nv, bl, enc = meta[sname]
            smap[sname] = (p, nv, bl, enc)
            p += bl
    out: dict = {}

    pos, nv, bl, enc = smap["geometry_types"]
    out["types"] = _byte_rle_tolerant(b, pos, nv)

    for key in ("geometry_offsets", "part_offsets", "ring_offsets"):
        if key in smap:
            pos, nv, bl, enc = smap[key]
            out[key] = _decode_int_stream(b, pos, nv, bl, enc)

    pos, nv, bl, enc = smap["vertex_buffer"]
    if ct in (_CT_ICE, _CT_ICE_MORTON):
        vpos, vnv, vbl, venc = smap["vertex_offsets"]
        offsets = _decode_int_stream(b, vpos, vnv, vbl, venc)
        if ct == _CT_ICE_MORTON:
            # morton-code deltas are PLAIN (non-zigzag) — the dictionary is
            # SFC-sorted ascending (decodeDeltaVarintMortonCodes,
            # decoder/DecodingUtils.java:394-409); the stream's enc byte
            # still says DELTA_ZIG_ZAG (writer mislabel, pinned empirically)
            if enc == _ENC_FASTPFOR_DELTA_ZZ or enc == _ENC_FASTPFOR_DELTA:
                codes = decode_fastpfor_delta(b[pos : pos + bl].tobytes(), nv)
            else:
                u, _ = C.decode_varint(b, nv, pos)
                codes = np.cumsum(u.view(I64), dtype=I64)
            max_bits = int(codes.max()).bit_length() if len(codes) else 0
            num_bits = max(int(extent).bit_length(), (max_bits + 1) // 2)
            dx, dy = _morton_decode_auto(codes, num_bits)
        else:
            deltas = _decode_coord_deltas(b, pos, nv, bl, enc)
            dx = np.cumsum(deltas[0::2], dtype=I64)
            dy = np.cumsum(deltas[1::2], dtype=I64)
        # gather: expand dictionary refs back to the per-vertex buffer
        vb = np.empty(2 * len(offsets), dtype=I64)
        vb[0::2] = dx[offsets]
        vb[1::2] = dy[offsets]
        out["vertex_buffer"] = vb
    else:
        deltas = _decode_coord_deltas(b, pos, nv, bl, enc)
        if per_part_reset:
            out["vertex_buffer"] = _accumulate_per_part(deltas, _part_lengths(out))
        else:
            # layout A goldens chain deltas GLOBALLY across features/parts
            # (verified against the MVT twins)
            vb = np.empty(len(deltas), dtype=I64)
            vb[0::2] = np.cumsum(deltas[0::2], dtype=I64)
            vb[1::2] = np.cumsum(deltas[1::2], dtype=I64)
            out["vertex_buffer"] = vb
    return out, p


def _part_lengths(geom: dict) -> np.ndarray:
    """Vertex count per delta-reset unit (point feature / linestring part /
    polygon ring): the old writer's getLineString resets previousX/Y to 0
    at each unit (evaluation/CovtParser.java:346-367), so the first vertex
    of every unit is absolute."""
    gt = geom["types"]
    go = geom.get("geometry_offsets")
    po = geom.get("part_offsets")
    ro = geom.get("ring_offsets")
    gi = pi = ri = 0
    parts: list[int] = []
    for t in gt:
        t = int(t)
        if t == GeometryType.POINT:
            parts.append(1)
        elif t == GeometryType.MULTIPOINT:
            n = int(go[gi]); gi += 1
            parts.extend([1] * n)
        elif t == GeometryType.LINESTRING:
            parts.append(int(po[pi])); pi += 1
        elif t == GeometryType.MULTILINESTRING:
            n = int(go[gi]); gi += 1
            for _ in range(n):
                parts.append(int(po[pi])); pi += 1
        elif t == GeometryType.POLYGON:
            nr = int(po[pi]); pi += 1
            for _ in range(nr):
                parts.append(int(ro[ri])); ri += 1
        else:  # MULTIPOLYGON
            npoly = int(go[gi]); gi += 1
            for _ in range(npoly):
                nr = int(po[pi]); pi += 1
                for _ in range(nr):
                    parts.append(int(ro[ri])); ri += 1
    return np.asarray(parts, dtype=np.int64)


def _accumulate_per_part(deltas: np.ndarray, part_lens: np.ndarray) -> np.ndarray:
    """Interleaved zigzag-decoded deltas -> absolute coords with the
    running sum reset at each part boundary (vectorized: global cumsum
    minus the cumsum value carried in from the previous part)."""
    n = len(deltas) // 2
    out = np.empty(2 * n, dtype=I64)
    for axis in range(2):
        d = deltas[axis::2]
        cs = np.cumsum(d, dtype=I64)
        starts = np.concatenate([[0], np.cumsum(part_lens)[:-1]])
        carry = np.zeros(len(part_lens), dtype=I64)
        nz = part_lens > 0
        carry[nz] = np.where(starts[nz] > 0, cs[starts[nz] - 1], 0)
        out[axis::2] = cs - np.repeat(carry, part_lens)
    return out


def _decode_coord_deltas(b, pos, nv, bl, enc):
    """Interleaved zigzag deltas; nv counts ints (2 per vertex)."""
    if enc == _ENC_VARINT_DELTA_ZZ:
        u, _ = C.decode_varint(b, nv, pos)
        return zz_to_signed(u)
    if enc == _ENC_FASTPFOR_DELTA_ZZ:
        return _unzigzag32(_decode_fastpfor_ints(b[pos : pos + bl].tobytes(), nv))
    raise ValueError(f"unsupported vertex_buffer encoding {enc}")


def zz_to_signed(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).astype(I64)) ^ -((u & np.uint64(1)).astype(I64))


def _decode_present(b, pos, nfeat):
    packed = _byte_rle_tolerant(b, pos, (nfeat + 7) // 8)
    return np.unpackbits(packed, bitorder="little")[:nfeat].astype(bool)


def _decode_property(b, p, cname, dt, ct, nfeat, streams, props):
    smap = {}
    for sname, nv, bl, enc in streams:
        smap[sname] = (p, nv, bl, enc)
        p += bl
    present = (
        _decode_present(b, smap["present"][0], nfeat)
        if "present" in smap
        else np.ones(nfeat, dtype=bool)
    )
    pos, nv, bl, enc = smap["data"]
    if dt == _DT_BOOL:
        vals = _decode_present(b, pos, nfeat)[present]
        props[cname] = PropertyColumn(ColumnDataType.BOOLEAN, present, vals)
    elif dt in (_DT_INT64, _DT_UINT64):
        vals = _decode_int_stream(b, pos, nv, bl, enc, signed=dt == _DT_INT64)
        props[cname] = PropertyColumn(
            _OLD_DT[dt], present, vals.astype(np.uint64) if dt == _DT_UINT64 else vals
        )
    elif dt == _DT_FLOAT:
        vals, _ = C.decode_floats_le(b, nv, pos)
        props[cname] = PropertyColumn(ColumnDataType.FLOAT, present, vals)
    elif dt == _DT_DOUBLE:
        # no golden carries doubles (the old converter threw on them); the
        # branch exists for tiles written by covt_ref_write.encode_ref_tile
        vals, _ = C.decode_doubles_le(b, nv, pos)
        props[cname] = PropertyColumn(ColumnDataType.DOUBLE, present, vals)
    elif dt == _DT_STRING:
        idx = _decode_int_stream(b, pos, nv, bl, enc)
        lpos, lnv, lbl, lenc = smap["length"]
        lengths = _decode_int_stream(b, lpos, lnv, lbl, lenc)
        dpos = smap["dictionary"][0]
        distinct = _gather_strings(b, dpos, lengths)
        props[cname] = PropertyColumn(ColumnDataType.STRING, present, distinct[idx])
    else:
        raise ValueError(f"unsupported property data type {dt}")
    return p


def _decode_localized(b, p, cname, nfeat, streams, props):
    """Shared-dictionary family: (present_X, X)* pairs then length +
    dictionary (covtDecoder.ts:375-420).  Member stream 'X' maps back to
    property 'name:X' / base name when X == cname."""
    smap = []
    for sname, nv, bl, enc in streams:
        smap.append((sname, p, nv, bl, enc))
        p += bl
    ln = next(s for s in smap if s[0] == "length")
    dc = next(s for s in smap if s[0] == "dictionary")
    lengths = _decode_int_stream(b, ln[1], ln[2], ln[3], ln[4])
    distinct = _gather_strings(b, dc[1], lengths)

    members = [s for s in smap if s[0] not in ("length", "dictionary")]
    for i in range(0, len(members) - 1, 2):
        pname, ppos, pnv, pbl, penc = members[i]
        vname, vpos, vnv, vbl, venc = members[i + 1]
        present = _decode_present(b, ppos, nfeat)
        idx = _decode_int_stream(b, vpos, vnv, vbl, venc)
        prop_name = cname if vname == cname else f"{cname}:{vname}"
        props[prop_name] = PropertyColumn(
            ColumnDataType.STRING, present, distinct[idx[: int(present.sum())]]
        )
    return p


def _canonical_props(props: dict) -> dict:
    """name_de and name:de denote the same logical column (the golden
    writer split on ':|_'); canonicalize to name:de.  Columns whose
    canonical names collide (tile carries BOTH forms) are dropped as
    ambiguous — the golden merged them irrecoverably."""
    out: dict = {}
    drop = set()
    for k, v in props.items():
        ck = "name:" + k.split("_", 1)[1] if k.startswith("name_") else k
        if ck in out:
            drop.add(ck)
        out[ck] = v
    return {k: v for k, v in out.items() if k not in drop}


def compare_with_mvt(mvt_layer, golden_layer) -> list[str]:
    """Differences between a golden decode and the MVT twin's decode, with
    the documented golden-generation tolerances applied:

    * POLYGON <-> MULTIPOLYGON classification is not recoverable from MVT
      wire (winding inference) — tolerated when that is the only gt diff.
    * id comparison is skipped when MVT ids exceed int32 (the old writer's
      delta chain wrapped at 32 bits) or when the golden ids are sorted
      ascending while the MVT's are not (id-scheme drift between tileset
      revisions).
    * property columns are compared on canonical names; columns the golden
      writer merged ambiguously (name:de + name_de) are skipped.

    Returns [] when the layers match under those rules.
    """
    a, b = mvt_layer, golden_layer
    issues: list[str] = []
    if a.num_features != b.num_features:
        return ["num_features"]
    gta = np.asarray(a.geometry_types)
    gtb = np.asarray(b.geometry_types)
    if not (gta == gtb).all():
        kinds = {(int(gta[i]), int(gtb[i])) for i in np.flatnonzero(gta != gtb)}
        if not kinds <= {(2, 5), (5, 2)}:
            issues.append("geometry_types")
    va = np.asarray(a.vertex_buffer)
    vb = np.asarray(b.vertex_buffer)
    if len(va) != len(vb) or not (va == vb).all():
        issues.append("vertex_buffer")
    ra = np.asarray(a.ring_offsets) if a.ring_offsets is not None else np.zeros(0)
    rb = np.asarray(b.ring_offsets) if b.ring_offsets is not None else np.zeros(0)
    if len(ra) != len(rb) or not (ra == rb).all():
        issues.append("ring_offsets")
    if a.ids is not None and b.ids is not None:
        aid = np.asarray(a.ids).astype(np.uint64)
        bid = np.asarray(b.ids).astype(np.uint64)
        small = bool((aid < 2**31).all())
        drift = bool((np.diff(bid.astype(np.int64)) >= 0).all() and not (np.diff(aid.astype(np.int64)) >= 0).all())
        if small and not drift and not (aid == bid).all():
            issues.append("ids")
    pa = _canonical_props(a.properties)
    pb = _canonical_props(b.properties)
    for k in set(pa) & set(pb):
        ca, cb = pa[k], pb[k]
        if not (np.asarray(ca.present) == np.asarray(cb.present)).all():
            issues.append(f"prop:{k}:present")
            continue
        if len(ca.values) != len(cb.values):
            issues.append(f"prop:{k}:count")
            continue
        try:
            if ColumnDataType(int(ca.data_type)) == ColumnDataType.STRING or ColumnDataType(int(cb.data_type)) == ColumnDataType.STRING:
                ok = all(str(x) == str(y) for x, y in zip(ca.values, cb.values))
            else:
                ok = all(float(x) == float(y) for x, y in zip(ca.values, cb.values))
        except (TypeError, ValueError):
            ok = False
        if not ok:
            issues.append(f"prop:{k}:values")
    return issues


def _gather_strings(b, pos, lengths) -> np.ndarray:
    ends = np.cumsum(lengths.astype(np.int64))
    starts = np.concatenate([[0], ends[:-1]])
    raw = bytes(b[pos : pos + int(ends[-1]) if len(ends) else pos])
    return np.array(
        [raw[s:e].decode("utf-8") for s, e in zip(starts, ends)], dtype=object
    )
