"""WebDataset-style tar-shard sink + source for the image corpus.

Large-scale image/caption training data ships as tar shards (the public
WebDataset convention: one tar per shard, each sample as `<key>.<ext>`
member files read sequentially) because object stores stream large
sequential tars far better than millions of small objects.  This module
speaks that layout with Ray Data stages:

* :func:`write_tar_shards` — a map-only sink: every input block becomes
  ONE tar shard written where the block lives (no shuffle; shard
  boundaries == block boundaries, so `ds.repartition(n)` controls shard
  size).  Tar bytes are DETERMINISTIC (mtime=0, uid/gid=0, no pax
  headers), so a re-run overwrites byte-identical shards — the same
  resumability contract as `tiling.write_tiles`.
* :func:`read_tar_shards` — `read_binary_files` over the shard dir +
  one vectorized untar per shard; members re-pair into (image_id,
  bytes, caption) rows.

Reference parity note: the reference engine has no tar surface (its
sinks are MBTiles/COVT, SURVEY §2 S-rows); this is part of the
beyond-reference training-data surface, next to the parquet corpora.
"""

from __future__ import annotations

import io
import os
import tarfile

import pyarrow as pa

import ray.data as rd


def _shard_bytes(ids: list[str], blobs: list[bytes], captions: list[str]) -> bytes:
    """One deterministic uncompressed tar: per sample `<id>.img` then
    `<id>.txt`, zeroed metadata so identical input -> identical bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for iid, blob, cap in zip(ids, blobs, captions):
            for name, payload in ((f"{iid}.img", blob), (f"{iid}.txt", cap.encode("utf-8"))):
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def write_tar_shards(images: rd.Dataset, out_dir: str) -> rd.Dataset:
    """Sink: one tar shard per input block, named by the block's first
    image id (deterministic under the fixed read order; a retried task
    rewrites the same file — atomic os.replace, so a crashed run never
    leaves half a shard).  Input columns: image_id, bytes, caption.
    Returns the LAZY shard-manifest Dataset (shard, n_samples,
    tar_bytes); consuming it drives the writes, and the small manifest
    is what a resuming run consults."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "shard": pa.array([], pa.string()),
                    "n_samples": pa.array([], pa.int64()),
                    "tar_bytes": pa.array([], pa.int64()),
                }
            )
        ids = b["image_id"].to_pylist()
        blob = _shard_bytes(ids, b["bytes"].to_pylist(), b["caption"].to_pylist())
        name = f"shard-{ids[0]}.tar"
        path = os.path.join(out_dir, name)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table(
            {
                "shard": pa.array([name], pa.string()),
                "n_samples": pa.array([b.num_rows], pa.int64()),
                "tar_bytes": pa.array([len(blob)], pa.int64()),
            }
        )

    return images.map_batches(
        write_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def write_jsonl_shards(docs: rd.Dataset, out_dir: str) -> rd.Dataset:
    """JSONL sink — the text-side shipping format (one JSON object per
    line, one .jsonl file per block, same deterministic/atomic contract
    as the tar sink).  Any column set serializes; keys emit in column
    order.  Returns the lazy shard manifest (shard, n_rows, jsonl_bytes)."""
    import json

    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "shard": pa.array([], pa.string()),
                    "n_rows": pa.array([], pa.int64()),
                    "jsonl_bytes": pa.array([], pa.int64()),
                }
            )
        cols = b.column_names
        data = {c: b[c].to_pylist() for c in cols}
        lines = [
            json.dumps({c: data[c][i] for c in cols}, ensure_ascii=False, sort_keys=False)
            for i in range(b.num_rows)
        ]
        blob = ("\n".join(lines) + "\n").encode("utf-8")
        name = f"docs-{data[cols[0]][0]}.jsonl"
        path = os.path.join(out_dir, name)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table(
            {
                "shard": pa.array([name], pa.string()),
                "n_rows": pa.array([b.num_rows], pa.int64()),
                "jsonl_bytes": pa.array([len(blob)], pa.int64()),
            }
        )

    return docs.map_batches(
        write_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def read_jsonl_shards(shard_dir: str) -> rd.Dataset:
    """Source: stream the JSONL shard dir back to rows (Ray's native
    line-delimited JSON reader; one read task per file)."""
    return rd.read_json(shard_dir, file_extensions=["jsonl"])


def read_tar_shards(shard_dir: str) -> rd.Dataset:
    """Source: stream the shard dir back to (image_id, bytes, caption)
    rows — read_binary_files hands each shard to one untar task, so
    parallelism == shard count and a shard never splits mid-sample."""
    files = rd.read_binary_files(shard_dir, include_paths=True)

    def untar(b: pa.Table) -> pa.Table:
        ids: list[str] = []
        blobs: list[bytes] = []
        caps: list[bytes] = []
        for data in b["bytes"].to_pylist():
            with tarfile.open(fileobj=io.BytesIO(data)) as tf:
                pending: dict[str, bytes] = {}
                for m in tf:
                    payload = tf.extractfile(m).read()
                    key, ext = m.name.rsplit(".", 1)
                    if ext == "img":
                        pending[key] = payload
                    else:  # .txt follows its .img within the sample
                        ids.append(key)
                        blobs.append(pending.pop(key))
                        caps.append(payload)
                if pending:  # pragma: no cover - malformed shard
                    raise ValueError(f"tar shard has {len(pending)} unpaired samples")
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.large_binary()),
                "caption": pa.array([c.decode("utf-8") for c in caps], pa.string()),
            }
        )

    return files.map_batches(untar, batch_format="pyarrow", batch_size=None)
