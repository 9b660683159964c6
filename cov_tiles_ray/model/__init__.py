"""COVT-R format model: enums, layer data model, metadata framing."""

from .format import (  # noqa: F401
    ColumnDataType,
    ColumnType,
    GeometryType,
    LayerData,
    PropertyColumn,
    StreamEncoding,
    StreamType,
)
