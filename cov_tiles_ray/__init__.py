"""cov_tiles_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch engine with the query/data-processing capabilities of the
springmeyer/cov-tiles reference (COVT column-stream vector tiles), rebuilt
Ray-Data-first:

* ``functions/`` — pure numpy/pyarrow kernels: stream codecs (varint, zigzag,
  delta, ORC-style RLE v1, byte/boolean RLE, FastPFOR-style patched
  bitpacking, Morton/Hilbert space-filling curves), spatial indexing
  (web-mercator z/x/y tiles, hex cells + k-ring, point-in-polygon),
  text analysis, dedup sketches (MinHash/SimHash), image codecs.
* ``model/`` — the COVT-R column-stream format model (stream/column/encoding
  enums mirroring the reference ordinals, metadata framing).
* ``tile/`` — per-tile encode/decode kernels (pure, per-group) and an
  MVT-equivalent baseline codec for compression-ratio benchmarks.
* ``stages/`` — Ray Data ``map_batches`` callables (stateless fns and actor
  classes) wrapping the kernels.
* ``pipelines/`` — end-to-end ``ray.data.Dataset`` graphs: ingest → assign →
  groupby(tile_id) → encode → write, plus dedup / ANN / analytics pipelines.
* ``sources/`` — readers and the deterministic synthetic corpus generator.
* ``state/`` — broadcast lookups, checkpoint/lineage manifests.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by ``bench.py``, CLI entry points and the pytest fixture.
"""

__version__ = "0.1.0"
