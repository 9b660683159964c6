"""Rows-only queries: pipelines whose semantics aren't SQL-expressible
(codec round-trips, sketches, heuristic scoring, image validation).  The
driver records a weaker rows-only check for these; their real oracles are
the pytest round-trip suites.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import dedup as dedup_f
from ..functions import text as text_f


def q_covt_tiles(sf_dir: str):
    """Flagship COVT tile packing over the synthetic image corpus at this
    scale factor: returns the verified tile table (tile ids, sizes,
    round-trip flags)."""
    from . import tiling

    images = tiling.read_images(sf_dir, columns=tiling.LIGHT_COLUMNS)
    tiles = tiling.build_tiles(images, z=7)
    return tiles.select_columns(
        ["tile_id", "z", "x", "y", "salt", "n_features", "covt_bytes", "plain_bytes", "roundtrip_ok"]
    )


def q_covt_compression(sf_dir: str):
    """Per-zoom compression summary (reference reduction formula,
    CovtConverterTest.java:278-291) across a 3-level tile pyramid."""
    from . import tiling
    from ray.data.aggregate import Count, Sum

    images = tiling.read_images(sf_dir, columns=tiling.LIGHT_COLUMNS)
    outs = []
    for z in (4, 6, 8):
        tiles = tiling.build_tiles(images, z=z)
        agg = (
            tiles.groupby("z")
            .aggregate(
                Count(alias_name="tiles"),
                Sum("n_features", alias_name="features"),
                Sum("covt_bytes", alias_name="covt_bytes"),
                Sum("plain_bytes", alias_name="plain_bytes"),
            )
            .to_pandas()
        )
        outs.append(agg)
    df = pd.concat(outs, ignore_index=True)
    df["reduction_pct_x100"] = (
        (1.0 - df["covt_bytes"] / df["plain_bytes"].clip(lower=1)) * 10000.0
    ).astype(np.int64)
    return df


def q_validate_images(sf_dir: str):
    """Per-row multimodal validation: decoded-pixel PSNR >= 40 dB (lossy) /
    exact (lossless) + caption equality (input_hint invariant)."""
    from . import tiling
    from ray.data.aggregate import Count, Sum

    images = tiling.read_images(sf_dir)
    val = tiling.validate_images(images)

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fmt": b["fmt"],
                "valid": pa.array(b["valid"].to_numpy(zero_copy_only=False).astype(np.int64)),
            }
        )

    return (
        val.map_batches(to_int, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(Count(alias_name="n"), Sum("valid", alias_name="n_valid"))
    )


def q_phash_dedup(sf_dir: str):
    """Exact near-duplicate dedup on the image corpus by perceptual hash:
    hash-partition by phash, keep the first image_id per bucket."""
    from . import tiling
    from ray.data.aggregate import Count, Min

    images = tiling.read_images(sf_dir, columns=["image_id", "phash"])
    return images.groupby("phash").aggregate(
        Min("image_id", alias_name="keep_image_id"), Count(alias_name="n_copies")
    )


def q_minhash_lsh_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs over documents, verified with
    exact n-gram Jaccard >= 0.5 (shingle -> minhash -> band -> bucket
    groupby -> verify; the canonical LSH pipeline)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    NUM_PERM, BANDS = 64, 16

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        sig = dedup_f.minhash_signatures(df["text"], num_perm=NUM_PERM)
        keys = dedup_f.lsh_band_keys(sig, num_bands=BANDS)
        n = len(df)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), BANDS),
                "band": np.tile(np.arange(BANDS, dtype=np.int64), n),
                "key": keys.reshape(-1),
                "sig": [s for s in np.repeat(sig, BANDS, axis=0)],
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_x100": []}).astype(
                {"doc_a": np.int64, "doc_b": np.int64, "est_x100": np.int64}
            )
        order = np.argsort(ids)
        ids = ids[order]
        sigs = np.stack(g["sig"].to_numpy()[order])
        a, b, est = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                e = float((sigs[i] == sigs[j]).mean())
                if e >= 0.5:
                    a.append(ids[i]); b.append(ids[j]); est.append(int(e * 100))
        return pd.DataFrame({"doc_a": a, "doc_b": b, "est_x100": est}).astype(np.int64)

    pairs = (
        ds.map_batches(sketch, batch_format="pandas")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    ).to_pandas()
    pairs = pairs.drop_duplicates(subset=["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
    return pa.table(
        {
            "doc_a": pa.array(pairs.doc_a.to_numpy(np.int64)),
            "doc_b": pa.array(pairs.doc_b.to_numpy(np.int64)),
            "est_x100": pa.array(pairs.est_x100.to_numpy(np.int64)),
        }
    )


def q_simhash_docs(sf_dir: str):
    """SimHash fingerprints per document."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": dedup_f.simhash(df["text"]).view(np.int64),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")


def q_langid_detect(sf_dir: str):
    """Heuristic language-id distribution (stopword-profile detector)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ray.data.aggregate import Count

    def lid(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"detected": text_f.detect_language(df["text"])})

    return ds.map_batches(lid, batch_format="pandas").groupby("detected").aggregate(
        Count(alias_name="n")
    )


def q_quality_scores(sf_dir: str):
    """Gopher/C4-style quality signals (float heuristics, rows-only)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        q = text_f.quality_score(df["text"])
        q.insert(0, "doc_id", df["doc_id"].to_numpy())
        return q

    return ds.map_batches(score, batch_format="pandas")


def q_ann_lsh_buckets(sf_dir: str):
    """Hyperplane-LSH bucketing of the embedding column (the ANN scale
    path: bucket histogram)."""
    from ..functions import ann as ann_f
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    planes = {}

    def bucket(b: pa.Table) -> pa.Table:
        vecs = np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float32)
        if "p" not in planes:
            planes["p"] = ann_f.hyperplane_lsh_params(vecs.shape[1], num_bits=12)
        return pa.table({"bucket": pa.array(ann_f.hyperplane_bucket(vecs, planes["p"]))})

    return ds.map_batches(bucket, batch_format="pyarrow").groupby("bucket").aggregate(
        Count(alias_name="n")
    )


ROWS_ONLY_QUERIES = {
    "covt_tiles": q_covt_tiles,
    "covt_compression": q_covt_compression,
    "validate_images": q_validate_images,
    "phash_dedup": q_phash_dedup,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_docs": q_simhash_docs,
    "langid_detect": q_langid_detect,
    "quality_scores": q_quality_scores,
    "ann_lsh_buckets": q_ann_lsh_buckets,
}
