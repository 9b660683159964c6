"""COVT-R format model.

Enum ordinals are bit-compatible with the reference
(springmeyer/cov-tiles: converter/StreamType.java, StreamEncoding.java,
ColumnType.java, ColumnDataType.java, geometry/GeometryType.java), so a
COVT-R stream descriptor byte ``streamType << 4 | streamEncoding`` and a
column descriptor byte ``dataType << 3 | columnType`` parse with the same
tables as the reference's new layout (CovtParser.java:574-652).

Framing divergences from the reference (documented, deliberate — COVT-R is
our own on-disk revision, not a byte-level port):

* tile header: ``varint version, varint num_layers`` (the reference's new
  layout has no tile header; its old layout had one — we keep one so a tile
  is self-describing without a sidecar).
* per-column explicit ``varint num_streams`` instead of the reference's
  implicit stream-list termination rules (CovtParser.java:638-648), which
  special-case geometry/PLAIN/DICTIONARY columns and skip PRESENT streams.
* the id column is supported (the reference's new-layout encoder disables it
  at CovtConverter.java:209-220 while its decoder still handles it).
* DOUBLE property columns are supported (plain f8 LE); the reference throws
  (CovtConverter.java:537-539).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum

import numpy as np

FORMAT_VERSION = 1

# First-varint marker of a CHUNKED tile frame (flag-gated scale variant,
# VERDICT r2 #1): ``varint CHUNKED_TILE_MARKER, varint n_chunks,
# varint len(chunk_i)..., chunk_0 bytes, chunk_1 bytes, ...`` where every
# chunk is a standard tile buffer holding a fid-ordered row range of the
# tile (whole-tile derived layers ride in chunk 0 only).  The decoder
# concatenates per-layer values, so a chunked tile decodes to LayerData
# identical to the unchunked encode of the same rows; only the BYTES
# differ (per-chunk dictionaries/stream selection).  Never written unless
# the chunked merge is enabled — default output stays byte-identical to
# the reference-parity encode.  127 can never collide with a version byte:
# layer headers pack version<<1 into one byte, capping FORMAT_VERSION at 63.
CHUNKED_TILE_MARKER = 127


class StreamType(IntEnum):
    PRESENT = 0
    DATA = 1
    LENGTH = 2
    DICTIONARY = 3
    GEOMETRY_TYPES = 4
    GEOMETRY_OFFSETS = 5
    PART_OFFSETS = 6
    RING_OFFSETS = 7
    VERTEX_OFFSETS = 8
    VERTEX_BUFFER = 9
    Z_VALUE = 10
    M_VALUE = 11


class StreamEncoding(IntEnum):
    PLAIN = 0
    VARINT = 1
    VARINT_ZIG_ZAG = 2
    VARINT_DELTA = 3  # positive-only
    VARINT_DELTA_ZIG_ZAG = 4
    RLE = 5
    BOOLEAN_RLE = 6
    BYTE_RLE = 7
    FAST_PFOR_DELTA = 8  # positive-only
    FAST_PFOR_DELTA_ZIG_ZAG = 9
    # Engine extension (plugin axis, SURVEY.md §2.10): second-level word
    # dictionary for caption-like string DICTIONARY streams; replaces the
    # LENGTH + DICTIONARY(utf-8 concat) pair when smaller.
    TOKEN_DICT = 10


class ColumnType(IntEnum):
    PLAIN = 0
    DICTIONARY = 1
    LOCALIZED_DICTIONARY = 2
    ICE = 3
    ICE_MORTON_CODE = 4


LOCALIZED_PREFIXES = ("name",)  # ref LOCALIZED_COLUM_NAME_PREFIXES, CovtConverter.java:88


def localized_base(name: str) -> str:
    """Family base of a localized column name: ``name:en``/``name_de`` ->
    ``name`` (reference split rule ``:|_`` behind a prefix allowlist,
    CovtConverter.java:498-504).  Used by BOTH the encoder's family grouping
    and the decoder's shared-dictionary resolution — must stay in sync."""
    if any(p in name for p in LOCALIZED_PREFIXES):
        return name.split(":", 1)[0].split("_", 1)[0]
    return name


class ColumnDataType(IntEnum):
    BOOLEAN = 0
    INT_32 = 1
    UINT_32 = 2
    INT_64 = 3
    UINT_64 = 4
    FLOAT = 5
    DOUBLE = 6
    STRING = 7
    GEOMETRY = 8
    GEOMETRY_M = 9
    GEOMETRY_Z = 10
    GEOMETRY_ZM = 11
    BINARY = 12
    TIMESTAMP = 13
    DATE = 14
    LIST = 15
    STRUCT = 16


class GeometryType(IntEnum):
    POINT = 0
    LINESTRING = 1
    POLYGON = 2
    MULTIPOINT = 3
    MULTILINESTRING = 4
    MULTIPOLYGON = 5


@dataclass
class PropertyColumn:
    """One property column: validity mask + dense values (present rows only).

    ``values`` length == ``present.sum()``; the Present stream is the Arrow
    validity-bitmap analogue (SURVEY.md §1.4).  For STRING columns ``values``
    is a numpy object array of python strings.
    """

    data_type: ColumnDataType
    present: np.ndarray  # bool per feature
    values: np.ndarray  # dense, only present rows

    def __eq__(self, other) -> bool:  # exact round-trip comparison
        if not isinstance(other, PropertyColumn):
            return NotImplemented
        if self.data_type != other.data_type or not np.array_equal(self.present, other.present):
            return False
        if self.data_type == ColumnDataType.FLOAT:
            return np.array_equal(
                np.asarray(self.values, dtype=np.float32), np.asarray(other.values, dtype=np.float32)
            )
        return np.array_equal(np.asarray(self.values), np.asarray(other.values))


@dataclass
class LayerData:
    """Decoded (in-memory) form of one COVT-R layer.

    Geometry follows the reference's stream layout (SURVEY.md §1.2 /
    CovtConverter.java:583-591): offsets are *counts per parent*, not
    absolute offsets; polygon rings exclude the closing vertex; the vertex
    buffer is interleaved x,y int32.  Mixed geometry types per layer are
    allowed; each stream only carries entries for the features that need it.
    """

    name: str
    extent: int
    geometry_types: np.ndarray  # uint8 per feature (GeometryType ordinal)
    vertex_buffer: np.ndarray  # interleaved int32 [x0,y0,x1,y1,...]
    geometry_offsets: np.ndarray | None = None  # per MULTI* feature: num parts
    part_offsets: np.ndarray | None = None  # per line: num vertices / per polygon: num rings
    ring_offsets: np.ndarray | None = None  # per ring: num vertices (closing vertex dropped)
    ids: np.ndarray | None = None  # uint64 per feature
    properties: dict[str, PropertyColumn] = field(default_factory=dict)

    @property
    def num_features(self) -> int:
        return len(self.geometry_types)

    def __eq__(self, other) -> bool:
        if not isinstance(other, LayerData):
            return NotImplemented

        def eq_opt(a, b):
            if a is None or len(a) == 0:
                return b is None or len(b) == 0
            return b is not None and np.array_equal(np.asarray(a), np.asarray(b))

        return (
            self.name == other.name
            and self.extent == other.extent
            and np.array_equal(self.geometry_types, other.geometry_types)
            and np.array_equal(self.vertex_buffer, other.vertex_buffer)
            and eq_opt(self.geometry_offsets, other.geometry_offsets)
            and eq_opt(self.part_offsets, other.part_offsets)
            and eq_opt(self.ring_offsets, other.ring_offsets)
            and eq_opt(self.ids, other.ids)
            and set(self.properties) == set(other.properties)
            and all(self.properties[k] == other.properties[k] for k in self.properties)
        )


# Candidate sets the encoder chooses from by encoded size (reference
# selection sites: ids CovtConverter.java:561-568, offsets :911-919, vertex
# buffer :656-668, long properties :1095-1109).  Order encodes the
# reference's deterministic tie-breaks (first candidate wins ties):
# FastPFOR-on-tie for topology/vertex streams ('<=' at :911 and :657),
# varint-on-tie for id/long streams (strict '<' at :561-568, :1095-1109).
INT_STREAM_CANDIDATES = (
    StreamEncoding.VARINT_ZIG_ZAG,
    StreamEncoding.VARINT_DELTA_ZIG_ZAG,
    StreamEncoding.RLE,
    # fixed-width fallback: wins on high-entropy values (e.g. random 64-bit
    # phashes average 9.5 varint bytes vs 8 plain); listed last so the
    # variable-length codecs keep the reference's tie-break priority
    StreamEncoding.PLAIN,
)
ID_STREAM_CANDIDATES = (
    StreamEncoding.VARINT,
    StreamEncoding.VARINT_DELTA_ZIG_ZAG,
    StreamEncoding.RLE,
)
TOPOLOGY_CANDIDATES = (
    StreamEncoding.FAST_PFOR_DELTA_ZIG_ZAG,
    StreamEncoding.RLE,
)
VERTEX_CANDIDATES = (
    StreamEncoding.FAST_PFOR_DELTA_ZIG_ZAG,
    StreamEncoding.VARINT_DELTA_ZIG_ZAG,
)
