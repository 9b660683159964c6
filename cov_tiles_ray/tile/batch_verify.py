"""Batched decode-verify of COVT-R tiles.

``verify_tiles`` reproduces ``verify_tile_buf(buf, nf, n_layers=nl)`` for a
whole batch of tiles at a fraction of the per-tile decode cost: framing is
parsed per tile (cheap scalar cursor), then every stream payload in the
batch is decoded grouped BY ENCODING FAMILY — one vectorized varint pass
over the concatenation of all varint-family streams, segmented inverse
delta/zigzag transforms, cached decodes for the constant RLE / BYTE_RLE /
BOOLEAN_RLE streams every tile repeats, and a structural (non-string-
materializing) validation of TOKEN_DICT payloads.

Semantics are EXACTLY the per-tile path's, enforced by a fallback ladder:

1. a tile using a feature outside the supported set (ICE geometry,
   localized dictionaries, float/double columns, rare encodings) is
   verified by ``verify_tile_buf`` individually;
2. every tile the fast path flags bad is CONFIRMED by ``verify_tile_buf``
   before being reported bad (the fast path's checks are a superset — e.g.
   it rejects non-canonical varints the tolerant per-tile decoder accepts);
3. any cross-instance misalignment inside a batched family (possible only
   with corrupt buffers) falls back to per-tile verification of the whole
   batch.

What "decode" means here: every byte of every stream is consumed and
validated — varint streams fully decoded and inverse-transformed,
dictionary indices bounds-checked against their dictionaries, dictionary
payloads checked for UTF-8 validity with entry boundaries on codepoint
starts, TOKEN_DICT decoded to validated columnar form (vocab lengths,
per-string token counts, token ids bounds-checked) without joining the
per-row Python strings.  The 1%-sample full-equality verify (encode-time
``full_ok``) still materializes strings via the scalar decoder and
compares LayerData field by field.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..functions import codecs as C
from ..functions import fastpfor as F
from ..model.format import (
    CHUNKED_TILE_MARKER,
    ColumnDataType,
    ColumnType,
    StreamEncoding,
    StreamType,
)

I64 = np.int64
U64 = np.uint64

_ST_PRESENT = int(StreamType.PRESENT)
_ST_DATA = int(StreamType.DATA)
_ST_LENGTH = int(StreamType.LENGTH)
_ST_DICT = int(StreamType.DICTIONARY)
_ST_GT = int(StreamType.GEOMETRY_TYPES)
_ST_VB = int(StreamType.VERTEX_BUFFER)

_E_PLAIN = int(StreamEncoding.PLAIN)
_E_VARINT = int(StreamEncoding.VARINT)
_E_VZZ = int(StreamEncoding.VARINT_ZIG_ZAG)
_E_VDZZ = int(StreamEncoding.VARINT_DELTA_ZIG_ZAG)
_E_RLE = int(StreamEncoding.RLE)
_E_BRLE = int(StreamEncoding.BOOLEAN_RLE)
_E_BYRLE = int(StreamEncoding.BYTE_RLE)
_E_FP_DZZ = int(StreamEncoding.FAST_PFOR_DELTA_ZIG_ZAG)
_E_TOKEN = int(StreamEncoding.TOKEN_DICT)

_CT_PLAIN = int(ColumnType.PLAIN)
_CT_DICT = int(ColumnType.DICTIONARY)

_DT_STRING = int(ColumnDataType.STRING)
_DT_GEOM = int(ColumnDataType.GEOMETRY)
_INT_DTS = {
    int(ColumnDataType.INT_32),
    int(ColumnDataType.UINT_32),
    int(ColumnDataType.INT_64),
    int(ColumnDataType.UINT_64),
}


class _Unsupported(Exception):
    """Route this tile to the scalar decoder."""


class _Bad(Exception):
    """Fast path says the tile is bad (confirmed per-tile before reporting)."""


@lru_cache(maxsize=16384)
def _cached_brle_ok(buf: bytes, n: int) -> bool:
    try:
        v, pos = C.decode_boolean_rle(buf, n, 0)
        return len(v) == n and pos == len(buf)
    except Exception:
        return False


@lru_cache(maxsize=16384)
def _cached_byrle_ok(buf: bytes, n: int) -> bool:
    try:
        v, pos = C.decode_byte_rle(buf, n, 0)
        return len(v) == n and pos == len(buf)
    except Exception:
        return False


@lru_cache(maxsize=16384)
def _cached_rle(buf: bytes, n: int):
    """(values, ok) of an RLE v1 decode consuming every byte.  Cached: the
    flagship's topology streams are a handful of constant buffers repeated
    across every tile."""
    try:
        v, pos = C.decode_rle_v1(buf, n, signed=True, offset=0)
        return v, (len(v) == n and pos == len(buf))
    except Exception:
        return None, False


class _Family:
    """One varint-encoding family: instance payloads are concatenated and
    decoded in a single vectorized pass; per-instance slices come back via
    value-count boundaries, validated against each instance's declared byte
    length."""

    __slots__ = ("parts", "nvals", "vals", "starts", "ends")

    def __init__(self):
        self.parts: list[bytes] = []
        self.nvals: list[int] = []
        self.vals = None
        self.starts = None
        self.ends = None

    def add(self, part: bytes, nv: int) -> int:
        self.parts.append(part)
        self.nvals.append(nv)
        return len(self.parts) - 1

    def decode(self) -> bool:
        """False on cross-instance misalignment (corrupt input)."""
        if not self.parts:
            self.vals = np.empty(0, dtype=U64)
            self.starts = np.empty(0, dtype=I64)
            self.ends = np.empty(0, dtype=I64)
            return True
        buf = b"".join(self.parts)
        total = int(sum(self.nvals))
        try:
            vals, pos = C.decode_varint(np.frombuffer(buf, dtype=np.uint8), total, 0)
        except Exception:
            return False
        if pos != len(buf):
            return False
        sizes = C.varint_encoded_size(vals)
        vbounds = np.zeros(total + 1, dtype=I64)
        np.cumsum(sizes, out=vbounds[1:])
        nv = np.array(self.nvals, dtype=I64)
        self.ends = np.cumsum(nv)
        self.starts = self.ends - nv
        inst_bytes = vbounds[self.ends] - vbounds[self.starts]
        if not np.array_equal(inst_bytes, np.array([len(p) for p in self.parts], dtype=I64)):
            return False
        self.vals = vals
        return True


def _seg_cumsum(d: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-segment cumsum (delta decode) of int64 deltas, vectorized; all
    segments non-empty."""
    out = np.cumsum(d, dtype=I64)
    if len(starts) > 1:
        correction = np.zeros(len(starts), dtype=I64)
        correction[1:] = out[starts[1:] - 1]
        out = out - np.repeat(correction, lens)
    return out


def _utf8_entries_ok(payload: bytes, lengths: np.ndarray) -> bool:
    """Every length-delimited entry of the concat is valid UTF-8: the whole
    payload decodes AND every cut lands on a codepoint start (a byte that is
    not a continuation byte)."""
    if int(lengths.sum()) != len(payload):
        return False
    try:
        payload.decode("utf-8")
    except UnicodeDecodeError:
        return False
    if len(lengths) > 1 and len(payload):
        cuts = np.cumsum(lengths[:-1])
        arr = np.frombuffer(payload, dtype=np.uint8)
        cuts = cuts[(cuts > 0) & (cuts < len(arr))]
        if len(cuts) and ((arr[cuts] & 0xC0) == 0x80).any():
            return False
    if (lengths < 0).any():
        return False
    return True


def _check_token_dict(payload: bytes, n_strings: int) -> bool:
    """Structural decode of a TOKEN_DICT stream: every component decoded and
    bounds-checked, no per-row string materialization."""
    try:
        n_vocab, pos = C.read_varint_py(payload, 0)
        if n_vocab > len(payload) * 10:  # a varint is >= 1 byte per entry
            return False
        lengths, pos = C.decode_varint(payload, n_vocab, pos)
        lengths = lengths.astype(I64)
        vb_total = int(lengths.sum())
        vocab_bytes = payload[pos : pos + vb_total]
        if len(vocab_bytes) != vb_total or not _utf8_entries_ok(vocab_bytes, lengths):
            return False
        pos += vb_total
        counts, pos = C.decode_varint(payload, n_strings, pos)
        total = int(counts.astype(I64).sum())
        if total > len(payload) * 10:
            return False
        ids, pos = C.decode_varint(payload, total, pos)
        if pos != len(payload):
            return False
        if total and int(ids.astype(I64).max()) >= n_vocab:
            return False
        return True
    except Exception:
        return False


class _BatchVerifier:
    def __init__(self):
        self.fam_varint = _Family()
        self.fam_vzz = _Family()
        self.fam_vdzz = _Family()
        self.fam_vdzz_xy = _Family()
        self.fam_rlelit = _Family()  # RLE v1 single-literal-group (zigzag varints)
        # deferred checks needing decoded family values:
        #   ("idxmax", tile, fam_name, slot, n_dict)
        #   ("dictlen", tile, fam_name_or_inline, slot_or_values, dict_bytes)
        self.checks: list[tuple] = []

    # -- framing --------------------------------------------------------------

    def parse_tile(self, b: bytes, nf: int, nl: int, tile: int) -> None:
        """Raises _Bad / _Unsupported; returning means structurally ok so far
        (pending deferred checks)."""
        version, pos = C.read_varint_py(b, 0)
        if version == CHUNKED_TILE_MARKER:
            # chunked tile frame: the scalar decoder owns concat semantics
            # (per-chunk payloads are verified by their own encode tasks in
            # the pipeline; this path only runs from tests/tools)
            raise _Unsupported
        num_layers, pos = C.read_varint_py(b, pos)
        if num_layers != nl:
            raise _Bad
        for layer_i in range(num_layers):
            header = b[pos]
            pos += 1
            if header & 1:
                raise _Unsupported  # optimized metadata needs the sidecar
            nlen, pos = C.read_varint_py(b, pos)
            pos += nlen
            extent, pos = C.read_varint_py(b, pos)
            nf_b = b[pos]
            if nf_b < 0x80:
                meta_nf = nf_b
                pos += 1
            else:
                meta_nf, pos = C.read_varint_py(b, pos)
            num_columns = b[pos]
            if num_columns < 0x80:
                pos += 1
            else:
                num_columns, pos = C.read_varint_py(b, pos)
            saw_ids = False
            saw_geometry = False
            gt_nvals = -1
            # pass 1: all column/stream descriptors (metadata block), exactly
            # like decode_layer's two-pass walk — stream payloads follow the
            # whole metadata block, in metadata order
            columns = []
            # descriptor walk with the 1-/2-byte varint cases inlined: this
            # loop runs ~70 varints per tile over >10k tiles per partition,
            # and the read_varint_py call overhead alone was ~20% of the
            # whole encode kernel's CPU (framing values are almost always
            # short varints on flagship tiles)
            rv = C.read_varint_py
            for _ in range(num_columns):
                cid = b[pos]
                if cid < 0x80:
                    pos += 1
                else:
                    cid, pos = rv(b, pos)
                if cid >= 2:
                    cnlen, pos = rv(b, pos)
                    pos += cnlen
                desc = b[pos]
                pos += 1
                dt = (desc >> 3) & 0xF
                ct = desc & 0x7
                ns = b[pos]
                if ns < 0x80:
                    pos += 1
                else:
                    ns, pos = rv(b, pos)
                if ct not in (_CT_PLAIN, _CT_DICT):
                    raise _Unsupported
                if dt not in _INT_DTS and dt not in (_DT_STRING, _DT_GEOM):
                    raise _Unsupported
                metas = []
                for _ in range(ns):
                    sd = b[pos]
                    p = pos + 1
                    nv = b[p]
                    if nv < 0x80:
                        p += 1
                    else:
                        nv, p = rv(b, p)
                    blen = b[p]
                    if blen < 0x80:
                        pos = p + 1
                    else:
                        b2 = b[p + 1]
                        if b2 < 0x80:
                            blen = (blen & 0x7F) | (b2 << 7)
                            pos = p + 2
                        else:
                            blen, pos = rv(b, p)
                    metas.append((sd >> 4, sd & 0xF, nv, blen))
                columns.append((cid, dt, ct, metas))
            # pass 2: stream payloads
            for cid, dt, ct, metas in columns:
                n_dict = -1
                dict_lengths = None  # ("inline", values) | (fam_name, slot)
                dict_bytes = None
                idx_ref = None  # ("inline", max) | (fam_name, slot)
                for stype, senc, nv, blen in metas:
                    payload = b[pos : pos + blen]
                    if len(payload) != blen:
                        raise _Bad
                    pos += blen
                    if stype == _ST_GT:
                        if senc != _E_BYRLE:
                            raise _Unsupported
                        gt_nvals = nv
                        if not _cached_byrle_ok(payload, nv):
                            raise _Bad
                    elif stype == _ST_PRESENT:
                        if senc != _E_BRLE:
                            raise _Unsupported
                        if not _cached_brle_ok(payload, nv):
                            raise _Bad
                    elif nv == 0 and senc in (_E_VARINT, _E_VZZ, _E_VDZZ):
                        if blen:
                            raise _Bad
                    elif senc == _E_VARINT:
                        self.fam_varint.add(payload, nv)
                        if cid == 0:
                            saw_ids = True
                    elif senc == _E_VZZ:
                        slot = self.fam_vzz.add(payload, nv)
                        if stype == _ST_DATA and dt == _DT_STRING:
                            idx_ref = ("vzz", slot)
                        if cid == 0:
                            saw_ids = True
                    elif senc == _E_VDZZ:
                        if stype == _ST_VB:
                            if nv % 2:
                                raise _Bad
                            self.fam_vdzz_xy.add(payload, nv)
                        else:
                            slot = self.fam_vdzz.add(payload, nv)
                            if stype == _ST_DATA and dt == _DT_STRING:
                                idx_ref = ("vdzz", slot)
                            if cid == 0:
                                saw_ids = True
                    elif senc == _E_PLAIN and stype != _ST_DICT:
                        if blen != 8 * nv:
                            raise _Bad
                        if stype == _ST_DATA and dt == _DT_STRING:
                            vals = np.frombuffer(payload, dtype="<i8")
                            idx_ref = ("inline", int(vals.max()) if nv else -1)
                        if cid == 0:
                            saw_ids = True
                    elif senc == _E_RLE:
                        if blen and payload[0] > 0x7F and (256 - payload[0]) == nv:
                            slot = self.fam_rlelit.add(payload[1:], nv)
                            if stype == _ST_LENGTH:
                                dict_lengths = ("rlelit", slot)
                            if stype == _ST_DATA and dt == _DT_STRING:
                                idx_ref = ("rlelit", slot)
                        else:
                            vals, rle_ok = _cached_rle(payload, nv)
                            if not rle_ok:
                                raise _Bad
                            if stype == _ST_LENGTH:
                                dict_lengths = ("inline", vals)
                            if stype == _ST_DATA and dt == _DT_STRING:
                                idx_ref = ("inline", int(vals.max()) if nv else -1)
                        if cid == 0:
                            saw_ids = True
                    elif senc == _E_FP_DZZ:
                        try:
                            vals, endpos = F.decode_fastpfor(payload, 0)
                        except Exception:
                            raise _Bad from None
                        if len(vals) != nv or endpos != blen:
                            raise _Bad
                        if cid == 0:
                            saw_ids = True
                    elif stype == _ST_DICT and senc == _E_TOKEN:
                        if not _check_token_dict(payload, nv):
                            raise _Bad
                        n_dict = nv
                    elif stype == _ST_DICT and senc == _E_PLAIN:
                        n_dict = nv
                        dict_bytes = payload
                    else:
                        raise _Unsupported
                if cid == 1:
                    saw_geometry = True
                if dt == _DT_STRING and ct == _CT_DICT:
                    if dict_bytes is not None:
                        if dict_lengths is None:
                            raise _Bad
                        self.checks.append(
                            ("dictlen", tile, dict_lengths[0], dict_lengths[1], dict_bytes)
                        )
                    if idx_ref is not None and n_dict >= 0:
                        if idx_ref[0] == "inline":
                            if idx_ref[1] >= n_dict:
                                raise _Bad
                        else:
                            self.checks.append(("idxmax", tile, idx_ref[0], idx_ref[1], n_dict))
            if layer_i == 0 and (gt_nvals != nf or not saw_ids or not saw_geometry):
                raise _Bad

    # -- batch decode + deferred checks --------------------------------------

    def finish(self, ok: np.ndarray, suspect: set) -> bool:
        """Decode families, run deferred checks.  Returns False when family
        alignment broke (caller re-verifies the whole batch per tile)."""
        for fam in (self.fam_varint, self.fam_vdzz_xy):
            if not fam.decode():
                return False
        decoded: dict[str, tuple[np.ndarray, _Family]] = {}
        for name, fam in (
            ("vzz", self.fam_vzz),
            ("vdzz", self.fam_vdzz),
            ("rlelit", self.fam_rlelit),
        ):
            if not fam.decode():
                return False
            sv = C.zigzag_decode(fam.vals)
            if name == "vdzz" and len(sv):
                sv = _seg_cumsum(sv, fam.starts, fam.ends - fam.starts)
            decoded[name] = (sv, fam)
        # vertex chains: full inverse transform (validates the stream end to
        # end; values themselves are unconstrained)
        xyfam = self.fam_vdzz_xy
        if len(xyfam.parts):
            sv = C.zigzag_decode(xyfam.vals)
            _seg_cumsum(sv[0::2], xyfam.starts // 2, (xyfam.ends - xyfam.starts) // 2)
            _seg_cumsum(sv[1::2], xyfam.starts // 2, (xyfam.ends - xyfam.starts) // 2)

        inst_max: dict[str, np.ndarray] = {}
        for name, (sv, fam) in decoded.items():
            if len(fam.parts):
                inst_max[name] = np.maximum.reduceat(sv, fam.starts)
            else:
                inst_max[name] = np.empty(0, dtype=I64)

        for chk in self.checks:
            kind, tile = chk[0], chk[1]
            if kind == "idxmax":
                _, _, fname, slot, n_dict = chk
                if int(inst_max[fname][slot]) >= n_dict:
                    ok[tile] = False
                    suspect.add(tile)
            else:  # dictlen
                _, _, src, ref, dict_bytes = chk
                if src == "inline":
                    lengths = np.asarray(ref, dtype=I64)
                else:
                    sv, fam = decoded[src]
                    lengths = sv[fam.starts[ref] : fam.ends[ref]]
                if not _utf8_entries_ok(dict_bytes, lengths):
                    ok[tile] = False
                    suspect.add(tile)
        return True


def verify_tiles(bufs, n_features, n_layers) -> np.ndarray:
    """Vectorized equivalent of
    ``[verify_tile_buf(bufs[i], n_features[i], n_layers=n_layers[i]) ...]``."""
    from ..stages.tile_encode import verify_tile_buf

    nf = np.asarray(n_features, dtype=I64)
    nl = np.asarray(n_layers, dtype=I64)
    n_tiles = len(bufs)
    ok = np.ones(n_tiles, dtype=bool)
    slow: list[int] = []
    suspect: set[int] = set()

    bv = _BatchVerifier()
    for i in range(n_tiles):
        b = bufs[i]
        if not isinstance(b, bytes):
            b = bytes(b)
        try:
            bv.parse_tile(b, int(nf[i]), int(nl[i]), i)
        except _Unsupported:
            slow.append(i)
        except Exception:  # _Bad or malformed framing
            ok[i] = False
            suspect.add(i)

    if not bv.finish(ok, suspect):
        # corruption broke cross-instance alignment: per-tile is the oracle
        return np.fromiter(
            (verify_tile_buf(bufs[i], int(nf[i]), n_layers=int(nl[i])) for i in range(n_tiles)),
            dtype=bool,
            count=n_tiles,
        )

    for i in slow:
        ok[i] = verify_tile_buf(bufs[i], int(nf[i]), n_layers=int(nl[i]))
    for i in suspect:
        ok[i] = verify_tile_buf(bufs[i], int(nf[i]), n_layers=int(nl[i]))
    return ok
