"""Flagship-schema segmented batch encoder.

Encodes EVERY tile of a hash partition in a handful of vectorized passes
instead of once-per-tile Python work.  Byte-for-byte identical to the
per-tile ``TileEncoder`` path (tests/test_batch_encode.py asserts equality
over randomized corpora); tiles whose shape leaves the fast path — n >=
RLE_MIN_VALUES (the ORC-RLE candidate joins), or a speculative ICE geometry
attempt would run (tile/encode.py:_encode_geometry_ice) — fall back to the
per-tile encoder one segment at a time.

Scope: the flagship image-corpus schema only (tile_id, salt, fid, loc_x,
loc_y, caption, fmt, phash), the pipeline that encodes ~10^5 tiles per
sf0.1 run and ~10^9 at the 10^12-image target.  Generality lives in
``TileEncoder``; this module exists because the flagship's median tile has
~5 features and the per-tile encoder pays ~1.3 ms of fixed cost per tile
(measured round 2) for what is, in aggregate, a few vectorizable array
passes.

Reference parity: the stream selection implemented here is the reference's
per-stream encoding-candidate argmin (CovtConverter.java:561-568, 656-668,
911-919, 1095-1109) — same candidates, same tie-breaks, same bytes; only
the batching differs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import codecs as C
from ..functions import fastpfor as F
from ..model.format import (
    ColumnDataType,
    ColumnType,
    FORMAT_VERSION,
    GeometryType,
    StreamEncoding,
    StreamType,
)
from ..tile import seg as S
from ..tile.encode import (
    FASTPFOR_MIN_VALUES,
    ICE_MIN_VERTICES,
    RLE_MIN_VALUES,
    _all_true_present,
    _const_byte_rle,
    _sfc_num_bits,
)

I64 = np.int64
U64 = np.uint64

_FLAGSHIP_COLS = {"tile_id", "salt", "fid", "loc_x", "loc_y", "caption", "fmt", "phash"}

# descriptor bytes (stype << 4 | senc), dt/ct bytes (dt << 3 | ct)
_B_DATA = lambda enc: (int(StreamType.DATA) << 4) | int(enc)  # noqa: E731
_B_PRESENT = (int(StreamType.PRESENT) << 4) | int(StreamEncoding.BOOLEAN_RLE)
_B_GT = (int(StreamType.GEOMETRY_TYPES) << 4) | int(StreamEncoding.BYTE_RLE)
_B_PART = (int(StreamType.PART_OFFSETS) << 4) | int(StreamEncoding.RLE)
_B_RING = (int(StreamType.RING_OFFSETS) << 4) | int(StreamEncoding.RLE)
_B_VB = lambda enc: (int(StreamType.VERTEX_BUFFER) << 4) | int(enc)  # noqa: E731
_B_LENGTH = (int(StreamType.LENGTH) << 4) | int(StreamEncoding.RLE)
_B_DICT_PLAIN = (int(StreamType.DICTIONARY) << 4) | int(StreamEncoding.PLAIN)
_B_DICT_TOKEN = (int(StreamType.DICTIONARY) << 4) | int(StreamEncoding.TOKEN_DICT)

_DT_IDS = (int(ColumnDataType.UINT_64) << 3) | int(ColumnType.PLAIN)
_DT_GEO = (int(ColumnDataType.GEOMETRY) << 3) | int(ColumnType.PLAIN)
_DT_STR = (int(ColumnDataType.STRING) << 3) | int(ColumnType.DICTIONARY)
_DT_I64 = (int(ColumnDataType.INT_64) << 3) | int(ColumnType.PLAIN)

_ENC_VARINT = int(StreamEncoding.VARINT)
_ENC_VZZ = int(StreamEncoding.VARINT_ZIG_ZAG)
_ENC_VDZZ = int(StreamEncoding.VARINT_DELTA_ZIG_ZAG)
_ENC_PLAIN = int(StreamEncoding.PLAIN)
_ENC_FP = int(StreamEncoding.FAST_PFOR_DELTA_ZIG_ZAG)

_av = C._append_varint
_vs = C.encode_varint_scalar


def eligible(inner, t: pa.Table) -> bool:
    """Fast-path admission: flagship schema + default-shaped options."""
    o = inner.opts
    if inner.with_mvt_baseline:
        return False
    if (
        o.geometry_encoding != "auto"
        or o.optimize_metadata
        or o.sort_points_on_curve
        or not o.include_ids
    ):
        return False
    if set(t.column_names) != _FLAGSHIP_COLS:
        return False
    if t["caption"].null_count or t["fmt"].null_count or t["phash"].null_count:
        return False
    return True


# ---------------------------------------------------------------------------
# integer DATA stream selection (vectorized candidates, winner slicing)
# ---------------------------------------------------------------------------


class _IntStream:
    """Candidate selection + byte emission for one DATA stream family across
    all segments.  ``kind``: 'id' -> (VARINT, VDZZ); 'int' -> (VZZ, VDZZ,
    PLAIN).  Value/segment indexing is in VALUE space (callers pass value
    starts/ends)."""

    def __init__(self, v: np.ndarray, vstarts: np.ndarray, vends: np.ndarray, kind: str):
        v = np.ascontiguousarray(v, dtype=I64)
        self.v = v
        if kind == "id":
            self.encs = (_ENC_VARINT, _ENC_VDZZ)
            cands = [S.VarintStream(v.view(U64)), S.delta_zigzag_stream(v, vstarts)]
            sizes = [c.seg_sizes(vstarts, vends) for c in cands]
            self.plain = None
        else:
            self.encs = (_ENC_VZZ, _ENC_VDZZ, _ENC_PLAIN)
            cands = [S.zigzag_stream(v), S.delta_zigzag_stream(v, vstarts)]
            sizes = [c.seg_sizes(vstarts, vends) for c in cands]
            sizes.append((vends - vstarts) * 8)
            self.plain = None  # built lazily
        self.cands = cands
        self.winner = S.choose(sizes)
        self.sizes = np.choose(self.winner, sizes)
        if len(self.encs) == 3 and (self.winner == 2).any():
            self.plain = v.astype("<i8").tobytes()
        self.enc_of = np.array(self.encs, dtype=np.int64)[self.winner]

    def emit(self, k: int, vs: int, ve: int) -> bytes:
        w = self.winner[k]
        if w < len(self.cands):
            return self.cands[w].slice(vs, ve)
        return self.plain[8 * vs : 8 * ve]


# ---------------------------------------------------------------------------
# string DICTIONARY column (global dict + per-segment insertion-order ranks)
# ---------------------------------------------------------------------------


def _local_ranks(keys_seg: np.ndarray, keys_code: np.ndarray, nseg: int, vocab: int):
    """First-appearance-order local dictionary for every segment at once.

    Rows are (segment, global code) pairs in stream order.  Returns
    ``local_idx`` (per row), ``pair_code`` (per distinct pair, grouped by
    segment in insertion order), ``pair_starts`` (segment boundaries in
    pair space, nseg+1)."""
    key = keys_seg.astype(I64) * vocab + keys_code
    uk, first_pos, inv = np.unique(key, return_index=True, return_inverse=True)
    useg = uk // vocab
    perm = np.lexsort((first_pos, useg))
    pair_counts = np.bincount(useg, minlength=nseg)
    pair_starts = np.zeros(nseg + 1, dtype=I64)
    np.cumsum(pair_counts, out=pair_starts[1:])
    rank_of_pair = np.empty(len(uk), dtype=I64)
    rank_of_pair[perm] = np.arange(len(uk)) - pair_starts[useg[perm]]
    local_idx = rank_of_pair[inv]
    pair_code = (uk % vocab)[perm]
    return local_idx, pair_code, pair_starts


class _StringColumn:
    """All per-segment artifacts of one STRING DICTIONARY column: DATA
    stream (local indices), LENGTH+DICTIONARY bytes, TOKEN_DICT bytes where
    it wins — sizes exact, bytes sliced from global encodes.  Matches
    tile/encode.py:_encode_property_column + _add_dictionary_streams."""

    def __init__(self, arr: pa.ChunkedArray, starts: np.ndarray, ends: np.ndarray):
        nseg = len(starts)
        self.nseg = nseg
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        d = pc.dictionary_encode(a)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(I64)
        gdict = d.dictionary
        V = max(len(gdict), 1)
        glen = pc.binary_length(gdict).to_numpy(zero_copy_only=False).astype(I64)
        graw: list[bytes] = gdict.cast(pa.binary()).to_pylist()

        n_per = ends - starts
        val_seg = np.repeat(np.arange(nseg), n_per)
        local_idx, pair_code, pair_starts = _local_ranks(val_seg, codes, nseg, V)
        self.pair_starts = pair_starts
        self.n_distinct = (pair_starts[1:] - pair_starts[:-1]).astype(I64)

        # DATA stream over local indices
        self.data = _IntStream(local_idx, starts, ends, "int")

        # plain dictionary payload: lengths + utf-8 concat
        llen = glen[pair_code]
        self.llen = llen
        self.dict_bounds = np.zeros(len(llen) + 1, dtype=I64)
        np.cumsum(llen, out=self.dict_bounds[1:])
        self.dict_all = b"".join([graw[c] for c in pair_code.tolist()])
        self.dict_sizes = self.dict_bounds[pair_starts[1:]] - self.dict_bounds[pair_starts[:-1]]

        # LENGTH stream: RLE of llen per segment — pure-literal segments are
        # batched, run-y segments call the greedy encoder (exact bytes)
        p0, p1 = pair_starts[:-1], pair_starts[1:]
        has_run = S.seg_has_rle_run(llen, p0, p1)
        zzlen = S.zigzag_stream(llen)
        self.len_bufs: list[bytes] = []
        lb_append = self.len_bufs.append
        for k in range(nseg):
            s, e = int(p0[k]), int(p1[k])
            if has_run[k] or e - s >= 128:
                lb_append(C.encode_rle_v1(llen[s:e], signed=True))
            else:
                lb_append(S.literal_rle_bytes(zzlen, s, e))
        self.len_sizes = np.array([len(b) for b in self.len_bufs], dtype=I64)

        # TOKEN_DICT attempt for segments whose plain dict payload >= 128
        self.tok_bufs: dict[int, bytes] = {}
        attempt = np.flatnonzero(self.dict_sizes >= 128)
        if len(attempt):
            self._token_attempt(gdict, pair_code, pair_starts, attempt)

    def _token_attempt(self, gdict, pair_code, pair_starts, attempt):
        # global token machinery, computed once per partition
        bad = pc.or_(
            pc.or_(pc.equal(gdict, ""), pc.match_substring(gdict, "  ")),
            pc.or_(pc.starts_with(gdict, " "), pc.ends_with(gdict, " ")),
        ).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(gdict, " ")
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(I64)
        flat = toks.flatten()
        fd = pc.dictionary_encode(flat)
        if isinstance(fd, pa.ChunkedArray):
            fd = fd.combine_chunks()
        tcodes = fd.indices.to_numpy(zero_copy_only=False).astype(I64)
        tvocab = fd.dictionary
        TV = max(len(tvocab), 1)
        tlen = pc.binary_length(tvocab).to_numpy(zero_copy_only=False).astype(I64)
        traw: list[bytes] = tvocab.cast(pa.binary()).to_pylist()
        tv_count = off[1:] - off[:-1]  # tokens per vocab string

        # expand ONLY the attempted segments into flat-token space
        att_mask = np.zeros(self.nseg, dtype=bool)
        att_mask[attempt] = True
        p0, p1 = pair_starts[:-1], pair_starts[1:]
        seg_of_pair = np.repeat(np.arange(self.nseg), p1 - p0)
        keep_pair = att_mask[seg_of_pair]
        kp_idx = np.flatnonzero(keep_pair)
        if not len(kp_idx):
            return
        kp_seg = seg_of_pair[kp_idx]
        kp_code = pair_code[kp_idx]
        # segments containing an unrepresentable string never tokenize
        seg_bad = np.zeros(self.nseg, dtype=bool)
        np.maximum.at(seg_bad, kp_seg, bad[kp_code])
        ok = ~seg_bad[kp_seg]
        kp_idx, kp_seg, kp_code = kp_idx[ok], kp_seg[ok], kp_code[ok]
        if not len(kp_idx):
            return
        # counts stream (tokens per distinct string), contiguous per segment
        kp_counts = tv_count[kp_code]
        counts_vs = S.VarintStream(kp_counts.view(U64))
        # per-kept-segment pair ranges in the KEPT pair space
        seg_ids, kseg_starts = np.unique(kp_seg, return_index=True)
        kseg_ends = np.concatenate([kseg_starts[1:], [len(kp_idx)]])

        # flat token stream: concat of each kept pair's tokens
        tok_total = int(kp_counts.sum())
        tpos = np.arange(tok_total)
        cum_counts = np.zeros(len(kp_counts) + 1, dtype=I64)
        np.cumsum(kp_counts, out=cum_counts[1:])
        pair_of_tok = np.searchsorted(cum_counts, tpos, side="right") - 1
        gather = off[kp_code][pair_of_tok] + (tpos - cum_counts[pair_of_tok])
        ptok = tcodes[gather]
        tok_seg = kp_seg[pair_of_tok]

        # local token vocab (insertion order) + local ids, per kept segment.
        # _local_ranks needs a dense 0..K-1 segment numbering.
        dense_seg = np.searchsorted(seg_ids, tok_seg)
        K = len(seg_ids)
        tok_local, tpair_code, tpair_starts = _local_ranks(dense_seg, ptok, K, TV)
        ids_vs = S.VarintStream(tok_local.view(U64))
        tok_seg_starts = np.zeros(K + 1, dtype=I64)
        np.cumsum(np.bincount(dense_seg, minlength=K), out=tok_seg_starts[1:])

        tv_len_local = tlen[tpair_code]
        tvlen_vs = S.VarintStream(tv_len_local.view(U64))
        tvb_bounds = np.zeros(len(tpair_code) + 1, dtype=I64)
        np.cumsum(tv_len_local, out=tvb_bounds[1:])
        tvb_all = b"".join([traw[c] for c in tpair_code.tolist()])

        # exact size per kept segment, then emit winners only
        tvlen_b = tvlen_vs.bounds
        counts_b = counts_vs.bounds
        ids_b = ids_vs.bounds
        for i in range(K):
            k = int(seg_ids[i])
            ps, pe = int(tpair_starts[i]), int(tpair_starts[i + 1])  # token-vocab
            ts, te = int(tok_seg_starts[i]), int(tok_seg_starts[i + 1])  # flat toks
            cs_, ce_ = int(kseg_starts[i]), int(kseg_ends[i])  # kept pairs
            nv = pe - ps
            size = (
                len(_vs(nv))
                + int(tvlen_b[pe] - tvlen_b[ps])
                + int(tvb_bounds[pe] - tvb_bounds[ps])
                + int(counts_b[ce_] - counts_b[cs_])
                + int(ids_b[te] - ids_b[ts])
            )
            if size < int(self.len_sizes[k]) + int(self.dict_sizes[k]):
                self.tok_bufs[k] = b"".join(
                    [
                        _vs(nv),
                        tvlen_vs.slice(ps, pe),
                        tvb_all[tvb_bounds[ps] : tvb_bounds[pe]],
                        counts_vs.slice(cs_, ce_),
                        ids_vs.slice(ts, te),
                    ]
                )

    # -- per-segment emission -------------------------------------------------

    def dict_streams(self, k: int) -> list[tuple[int, int, bytes]]:
        """[(descriptor_byte, nvals, buf), ...] for the dictionary payload."""
        nd = int(self.n_distinct[k])
        tok = self.tok_bufs.get(k)
        if tok is not None:
            return [(_B_DICT_TOKEN, nd, tok)]
        s, e = int(self.pair_starts[k]), int(self.pair_starts[k + 1])
        return [
            (_B_LENGTH, nd, self.len_bufs[k]),
            (_B_DICT_PLAIN, nd, self.dict_all[self.dict_bounds[s] : self.dict_bounds[e]]),
        ]


# ---------------------------------------------------------------------------
# fallback routing: which segments leave the fast path
# ---------------------------------------------------------------------------


def _seg_unique_counts(keys: np.ndarray, seg_of: np.ndarray, nseg: int) -> np.ndarray:
    """#distinct keys per segment (keys already segment-scoped)."""
    uk, first = np.unique(keys, return_index=True)
    return np.bincount(seg_of[first], minlength=nseg)


def _ice_would_run(
    x: np.ndarray, y: np.ndarray, starts: np.ndarray, ends: np.ndarray, extent: int
) -> np.ndarray:
    """Per segment: would _encode_geometry_ice(speculative=True) proceed past
    its gates (min vertices, SFC domain, dedup ratio)?  Those segments take
    the per-tile path so the ICE-vs-plain size race stays byte-exact."""
    n = ends - starts
    nseg = len(starts)
    out = np.zeros(nseg, dtype=bool)
    cand = n >= ICE_MIN_VERTICES
    if not cand.any():
        return out
    num_bits = _sfc_num_bits(extent)
    half = 1 << (num_bits - 1)
    xm = np.minimum.reduceat(x, starts)
    xM = np.maximum.reduceat(x, starts)
    ym = np.minimum.reduceat(y, starts)
    yM = np.maximum.reduceat(y, starts)
    cand &= (xm >= -half) & (xM < half) & (ym >= -half) & (yM < half)
    if not cand.any():
        return out
    idx = np.flatnonzero(cand)
    sel_rows = np.concatenate([np.arange(starts[k], ends[k]) for k in idx.tolist()])
    seg_of = np.repeat(np.arange(len(idx)), (ends - starts)[idx])
    packed = (x[sel_rows].astype(I64) + half) * I64(4 * half) + (y[sel_rows].astype(I64) + half)
    key = seg_of * I64(4 * half) * I64(4 * half) + packed
    uniq = _seg_unique_counts(key, seg_of, len(idx))
    out[idx] = uniq <= 0.9 * (ends - starts)[idx]
    return out


# ---------------------------------------------------------------------------
# the encoder
# ---------------------------------------------------------------------------


def encode_flagship_table(
    t: pa.Table,
    starts: np.ndarray,
    ends: np.ndarray,
    tid: np.ndarray,
    salt: np.ndarray,
    inner,
) -> list[dict]:
    """t sorted by (tile_id, salt, fid); one row dict per (tile_id, salt)
    segment, identical to TileEncoder.encode_one_table output."""
    from .tile_encode import (
        VERIFY_FULL_MOD,
        cells_layer_from_points,
        table_to_layer,
        verify_tile_buf,
        CELL_BITS,
        _CELLS_LAYER,
        _POINT_LAYER,
    )

    extent = inner.extent
    opts = inner.opts
    with_cells = inner.with_cells
    nseg = len(starts)
    n = ends - starts

    fid = t["fid"].to_numpy(zero_copy_only=False).astype(I64)
    x = t["loc_x"].to_numpy(zero_copy_only=False).astype(I64)
    y = t["loc_y"].to_numpy(zero_copy_only=False).astype(I64)
    phash = t["phash"].to_numpy(zero_copy_only=False).astype(I64)
    cap_len = pc.binary_length(t["caption"]).to_numpy(zero_copy_only=False).astype(I64)
    fmt_len = pc.binary_length(t["fmt"]).to_numpy(zero_copy_only=False).astype(I64)

    # ---- fallback routing ---------------------------------------------------
    fallback = n >= RLE_MIN_VALUES
    fallback |= _ice_would_run(x, y, starts, ends, extent)

    # ---- cells derivation (vectorized across segments) ----------------------
    if with_cells:
        g = 1 << CELL_BITS
        cs = extent >> CELL_BITS
        seg_of_row = np.repeat(np.arange(nseg), n)
        cx = np.clip(x // cs, 0, g - 1)
        cy = np.clip(y // cs, 0, g - 1)
        ckey = seg_of_row * I64(g * g) + cy * g + cx
        uck, counts = np.unique(ckey, return_counts=True)
        cseg = (uck // (g * g)).astype(I64)
        cid = (uck % (g * g)).astype(I64)
        nc_per = np.bincount(cseg, minlength=nseg).astype(I64)
        cstarts = np.zeros(nseg + 1, dtype=I64)
        np.cumsum(nc_per, out=cstarts[1:])
        x0 = (cid % g) * cs
        y0 = (cid // g) * cs
        ncall = len(cid)
        corner_x = np.empty(4 * ncall, dtype=I64)
        corner_y = np.empty(4 * ncall, dtype=I64)
        corner_x[0::4], corner_y[0::4] = x0, y0
        corner_x[1::4], corner_y[1::4] = x0 + cs, y0
        corner_x[2::4], corner_y[2::4] = x0 + cs, y0 + cs
        corner_x[3::4], corner_y[3::4] = x0, y0 + cs
        fallback |= _ice_would_run(
            corner_x, corner_y, cstarts[:-1] * 4, cstarts[1:] * 4, extent
        )

    fb_idx = set(np.flatnonzero(fallback).tolist())
    fast = ~fallback

    # ---- point-layer streams ------------------------------------------------
    ids_st = _IntStream(fid, starts, ends, "id")
    vb_zz = C.zigzag_encode(S.seg_coord_delta(x, y, starts))
    vb_vs = S.VarintStream(vb_zz)
    phash_st = _IntStream(phash, starts, ends, "int")
    cap = _StringColumn(t["caption"], starts, ends)
    fmt = _StringColumn(t["fmt"], starts, ends)

    # point vertex buffer candidates: FastPFOR joins at 2n >= FASTPFOR_MIN —
    # unreachable here (n < 32 in the fast path), asserted not sized
    if opts.allow_fastpfor_vertex:
        assert not (fast & (2 * n >= FASTPFOR_MIN_VALUES)).any()

    # ---- cells-layer streams ------------------------------------------------
    if with_cells:
        cends = cstarts[1:]
        cst = cstarts[:-1]
        cids_st = _IntStream(cid, cst, cends, "id")
        npts_st = _IntStream(counts.astype(I64), cst, cends, "int")
        cvb_zz = C.zigzag_encode(S.seg_coord_delta(corner_x, corner_y, cst * 4))
        cvb_vs = S.VarintStream(cvb_zz)
        # vertex candidates: (FP_DZZ, VDZZ) when 8*nc >= 64, else VDZZ only
        cvb_vdzz_sizes = cvb_vs.seg_sizes(cst * 8, cends * 8)
        if opts.allow_fastpfor_vertex:
            fp_sizes = S.fastpfor_seg_sizes(
                cvb_zz.astype(np.uint32), cst * 8, cends * 8
            )
            fp_applies = 8 * nc_per >= FASTPFOR_MIN_VALUES
            # FastPFOR listed first -> wins ties (<=)
            cvb_use_fp = fp_applies & (fp_sizes <= cvb_vdzz_sizes)
        else:
            cvb_use_fp = np.zeros(nseg, dtype=bool)
            fp_sizes = cvb_vdzz_sizes
        cvb_sizes = np.where(cvb_use_fp, fp_sizes, cvb_vdzz_sizes)

    # ---- sanity: zigzag of coords stays in u32 for FastPFOR ----------------
    # (coords are tile-local; the transform can't overflow u32 here)

    # ---- per-tile assembly --------------------------------------------------
    point_name = _POINT_LAYER.encode("utf-8")
    cells_name = _CELLS_LAYER.encode("utf-8")
    head = _vs(FORMAT_VERSION) + _vs(2 if with_cells else 1)
    ver_byte = (FORMAT_VERSION << 1) | 0

    n_l = n.tolist()
    tid_l = tid.tolist()
    salt_l = salt.tolist()
    starts_l = starts.tolist()
    ends_l = ends.tolist()
    ids_sizes_l = ids_st.sizes.tolist()
    ids_enc_l = ids_st.enc_of.tolist()
    vb_sizes = vb_vs.seg_sizes(2 * starts, 2 * ends)
    vb_sizes_l = vb_sizes.tolist()
    ph_sizes_l = phash_st.sizes.tolist()
    ph_enc_l = phash_st.enc_of.tolist()

    rows: list[dict] = []
    cap_bytes_seg = np.add.reduceat(cap_len, starts) if len(cap_len) else np.zeros(0)
    fmt_bytes_seg = np.add.reduceat(fmt_len, starts) if len(fmt_len) else np.zeros(0)

    for k in range(nseg):
        if k in fb_idx:
            rows.append(
                inner.encode_one_table(
                    t.slice(starts_l[k], ends_l[k] - starts_l[k]), int(tid_l[k]), int(salt_l[k])
                )
            )
            continue
        nk = n_l[k]
        s, e = starts_l[k], ends_l[k]
        present = _all_true_present(nk)
        gt_buf = _const_byte_rle(int(GeometryType.POINT), nk)

        md = bytearray()
        md.append(ver_byte)
        _av(md, len(point_name))
        md += point_name
        _av(md, extent)
        _av(md, nk)
        _av(md, 5)
        stream_parts: list[bytes] = []
        # col 0: ids
        _av(md, 0)
        md.append(_DT_IDS)
        _av(md, 1)
        md.append(_B_DATA(ids_enc_l[k]))
        _av(md, nk)
        _av(md, ids_sizes_l[k])
        stream_parts.append(ids_st.emit(k, s, e))
        # col 1: geometry (plain)
        _av(md, 1)
        md.append(_DT_GEO)
        _av(md, 2)
        md.append(_B_GT)
        _av(md, nk)
        _av(md, len(gt_buf))
        stream_parts.append(gt_buf)
        md.append(_B_VB(_ENC_VDZZ))
        _av(md, 2 * nk)
        _av(md, vb_sizes_l[k])
        stream_parts.append(vb_vs.slice(2 * s, 2 * e))
        # cols 2, 3: caption / fmt dictionaries
        for col_id, name_raw, col in ((2, b"caption", cap), (3, b"fmt", fmt)):
            dstreams = col.dict_streams(k)
            _av(md, col_id)
            _av(md, len(name_raw))
            md += name_raw
            md.append(_DT_STR)
            _av(md, 2 + len(dstreams))
            md.append(_B_PRESENT)
            _av(md, nk)
            _av(md, len(present))
            stream_parts.append(present)
            md.append(_B_DATA(int(col.data.enc_of[k])))
            _av(md, nk)
            _av(md, int(col.data.sizes[k]))
            stream_parts.append(col.data.emit(k, s, e))
            for desc, nvals, buf in dstreams:
                md.append(desc)
                _av(md, nvals)
                _av(md, len(buf))
                stream_parts.append(buf)
        # col 4: phash
        _av(md, 4)
        _av(md, 5)
        md += b"phash"
        md.append(_DT_I64)
        _av(md, 2)
        md.append(_B_PRESENT)
        _av(md, nk)
        _av(md, len(present))
        stream_parts.append(present)
        md.append(_B_DATA(ph_enc_l[k]))
        _av(md, nk)
        _av(md, ph_sizes_l[k])
        stream_parts.append(phash_st.emit(k, s, e))

        parts = [head, bytes(md)] + stream_parts
        plain_b = (
            2 * nk * 4
            + nk
            + 8 * nk
            + (int(cap_bytes_seg[k]) + nk + nk // 8 + 1)
            + (int(fmt_bytes_seg[k]) + nk + nk // 8 + 1)
            + (8 * nk + nk // 8 + 1)
        )
        n_layers = 1

        if with_cells:
            ck0, ck1 = int(cstarts[k]), int(cstarts[k + 1])
            nck = ck1 - ck0
            cpresent = _all_true_present(nck)
            cgt = _const_byte_rle(int(GeometryType.POLYGON), nck)
            part_buf = C._const_rle_v1(1, nck, True)
            ring_buf = C._const_rle_v1(4, nck, True)
            cmd = bytearray()
            cmd.append(ver_byte)
            _av(cmd, len(cells_name))
            cmd += cells_name
            _av(cmd, extent)
            _av(cmd, nck)
            _av(cmd, 3)
            cparts: list[bytes] = []
            _av(cmd, 0)
            cmd.append(_DT_IDS)
            _av(cmd, 1)
            cmd.append(_B_DATA(int(cids_st.enc_of[k])))
            _av(cmd, nck)
            _av(cmd, int(cids_st.sizes[k]))
            cparts.append(cids_st.emit(k, ck0, ck1))
            _av(cmd, 1)
            cmd.append(_DT_GEO)
            _av(cmd, 4)
            cmd.append(_B_GT)
            _av(cmd, nck)
            _av(cmd, len(cgt))
            cparts.append(cgt)
            cmd.append(_B_PART)
            _av(cmd, nck)
            _av(cmd, len(part_buf))
            cparts.append(part_buf)
            cmd.append(_B_RING)
            _av(cmd, nck)
            _av(cmd, len(ring_buf))
            cparts.append(ring_buf)
            if cvb_use_fp[k]:
                cmd.append(_B_VB(_ENC_FP))
                _av(cmd, 8 * nck)
                _av(cmd, int(cvb_sizes[k]))
                cparts.append(
                    F.encode_fastpfor(cvb_zz[8 * ck0 : 8 * ck1].astype(np.uint32))
                )
            else:
                cmd.append(_B_VB(_ENC_VDZZ))
                _av(cmd, 8 * nck)
                _av(cmd, int(cvb_sizes[k]))
                cparts.append(cvb_vs.slice(8 * ck0, 8 * ck1))
            _av(cmd, 2)
            _av(cmd, 5)
            cmd += b"n_pts"
            cmd.append(_DT_I64)
            _av(cmd, 2)
            cmd.append(_B_PRESENT)
            _av(cmd, nck)
            _av(cmd, len(cpresent))
            cparts.append(cpresent)
            cmd.append(_B_DATA(int(npts_st.enc_of[k])))
            _av(cmd, nck)
            _av(cmd, int(npts_st.sizes[k]))
            cparts.append(npts_st.emit(k, ck0, ck1))
            parts += [bytes(cmd)] + cparts
            plain_b += 8 * nck * 4 + nck + 8 * nck + (8 * nck + nck // 8 + 1)
            n_layers = 2

        buf = b"".join(parts)
        tidk = int(tid_l[k])
        if tidk % VERIFY_FULL_MOD == 0:
            sub = t.slice(s, e - s)
            layers = [table_to_layer(sub, extent)]
            if with_cells:
                layers.append(cells_layer_from_points(layers[0].vertex_buffer, extent))
            full_ok = verify_tile_buf(buf, nk, expect_layers=layers, n_layers=n_layers)
        else:
            full_ok = True
        rows.append(
            {
                "tile_id": tidk,
                "z": tidk >> 58,
                "x": (tidk >> 29) & ((1 << 29) - 1),
                "y": tidk & ((1 << 29) - 1),
                "salt": int(salt_l[k]),
                "n_features": nk,
                "n_layers": n_layers,
                "covt": buf,
                "covt_bytes": len(buf),
                "plain_bytes": plain_b,
                "full_ok": full_ok,
            }
        )
    return rows
