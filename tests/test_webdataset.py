"""WebDataset tar-shard sink/source: deterministic shard bytes, sample
round trip, and the corpus-level roundtrip query."""

from __future__ import annotations

import io
import tarfile

import pyarrow as pa

from cov_tiles_ray.sources import webdataset as wds


def test_shard_bytes_deterministic_and_paired():
    ids = ["img000000000001", "img000000000002"]
    blobs = [b"\x01\x02\x03", b"\xff" * 10]
    caps = ["a cat", "a dog"]
    t1 = wds._shard_bytes(ids, blobs, caps)
    t2 = wds._shard_bytes(ids, blobs, caps)
    assert t1 == t2  # byte-deterministic (zeroed mtime/uid/gid)
    with tarfile.open(fileobj=io.BytesIO(t1)) as tf:
        names = tf.getnames()
        assert names == [
            "img000000000001.img",
            "img000000000001.txt",
            "img000000000002.img",
            "img000000000002.txt",
        ]
        assert tf.extractfile("img000000000002.img").read() == blobs[1]
        assert tf.extractfile("img000000000001.txt").read() == b"a cat"


def test_write_read_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table(
        {
            "image_id": pa.array([f"img{i:012d}" for i in range(20)]),
            "bytes": pa.array([bytes([i]) * (i + 1) for i in range(20)], pa.large_binary()),
            "caption": pa.array([f"caption {i}" for i in range(20)]),
        }
    )
    ds = rd.from_arrow(t)
    manifest = wds.write_tar_shards(ds, str(tmp_path)).to_pandas()
    assert manifest["n_samples"].sum() == 20
    back = (
        wds.read_tar_shards(str(tmp_path))
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    orig = t.to_pandas().sort_values("image_id", ignore_index=True)
    assert list(back["image_id"]) == list(orig["image_id"])
    assert list(back["caption"]) == list(orig["caption"])
    assert [bytes(x) for x in back["bytes"]] == [bytes(x) for x in orig["bytes"]]


def test_image_tar_roundtrip_query(ray_session):
    from cov_tiles_ray.pipelines.rows_only import q_image_tar_roundtrip

    df = q_image_tar_roundtrip("/root/testdata/sf0.001")
    assert df["n_mismatch"].iloc[0] == 0
    assert df["n_images"].iloc[0] == 6000
    assert df["n_shards"].iloc[0] >= 1


def test_documents_jsonl_roundtrip_query(ray_session):
    from cov_tiles_ray.pipelines.rows_only import q_documents_jsonl_roundtrip

    df = q_documents_jsonl_roundtrip("/root/testdata/sf0.001")
    assert df["n_mismatch"].iloc[0] == 0
    assert df["n_docs"].iloc[0] == 500
