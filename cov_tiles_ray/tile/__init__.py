"""Per-tile COVT-R encode/decode kernels (pure functions, no Ray)."""

from .decode import decode_tile  # noqa: F401
from .encode import EncodeOptions, encode_tile  # noqa: F401
from .sidecar import (  # noqa: F401
    SidecarIds,
    build_sidecar,
    merge_sidecars,
    parse_sidecar,
    sidecar_for_dataset,
    sidecar_json,
)
