import numpy as np
import pandas as pd
import pytest

from cov_tiles_ray.functions import ann, dedup, image, text


class TestText:
    def test_token_counts(self):
        s = pd.Series(["hello world", "", None, "a b  c"])
        np.testing.assert_array_equal(text.token_count_whitespace(s), [2, 0, 0, 3])
        assert text.token_count_bpe(pd.Series(["it's a test-case"]))[0] >= 4

    def test_langid(self):
        s = pd.Series(
            [
                "the cat sat on the mat and it was good",
                "der Hund ist nicht mit der Katze zu sehen",
                "le chat est dans la maison pour le moment",
                "zzzz qqqq",
            ]
        )
        got = text.detect_language(s)
        assert list(got[:3]) == ["en", "de", "fr"]
        assert got[3] == "und"

    def test_quality(self):
        q = text.quality_score(pd.Series(["The quick brown fox jumps over the lazy dog."]))
        assert q["n_words"][0] == 9
        assert 0 < q["stopword_ratio"][0] < 0.5
        assert 0 < q["punct_ratio"][0] < 0.1

    def test_fingerprint_deterministic(self):
        s = pd.Series(["abc", "abc", "abd"])
        fp = text.fingerprint(s)
        assert fp[0] == fp[1] != fp[2]
        ff = text.fingerprint_fast(s)
        assert ff[0] == ff[1] != ff[2]


class TestDedup:
    def test_minhash_similarity_ordering(self):
        base = "the quick brown fox jumps over the lazy dog " * 10
        near = base.replace("lazy", "sleepy")
        far = "completely different content about databases and engines " * 10
        sig = dedup.minhash_signatures(pd.Series([base, near, far]), num_perm=128)
        sim_near = dedup.minhash_jaccard_estimate(sig[0], sig[1])
        sim_far = dedup.minhash_jaccard_estimate(sig[0], sig[2])
        exact_near = dedup.ngram_jaccard(base, near)
        assert sim_near == pytest.approx(exact_near, abs=0.15)  # estimator accuracy
        assert sim_near > sim_far + 0.2
        # identical docs estimate 1.0
        sig2 = dedup.minhash_signatures(pd.Series([base, base]), num_perm=64)
        assert dedup.minhash_jaccard_estimate(sig2[0], sig2[1]) == 1.0

    def test_lsh_bands_collide_for_duplicates(self):
        a = "identical document text for banding " * 5
        sig = dedup.minhash_signatures(pd.Series([a, a]), num_perm=128)
        k = dedup.lsh_band_keys(sig, num_bands=16)
        assert (k[0] == k[1]).all()

    def test_ngram_jaccard(self):
        assert dedup.ngram_jaccard("a b c d e f", "a b c d e f") == 1.0
        assert dedup.ngram_jaccard("a b c d e f", "x y z w v u") == 0.0

    def test_simhash_near(self):
        s = pd.Series(
            ["the quick brown fox jumps over the lazy dog " * 5,
             "the quick brown fox jumps over the lazy cat " * 5,
             "unrelated words entirely here about something else " * 5]
        )
        h = dedup.simhash(s)
        d_near = dedup.hamming_distance64(h[:1], h[1:2])[0]
        d_far = dedup.hamming_distance64(h[:1], h[2:3])[0]
        assert d_near < d_far


class TestAnn:
    def test_brute_force_topk_exact(self):
        rng = np.random.default_rng(2)
        vecs = rng.standard_normal((500, 16)).astype(np.float32)
        ids = np.arange(500)
        q = ann.normalize_rows(vecs[[3, 77]])
        qi, vi, sc = ann.cosine_topk_block(vecs, ids, q, k=5)
        fq, fi, fs, fr = ann.merge_topk(qi, vi, sc, 5)
        # each query's top-1 is itself
        assert fi[fr == 0].tolist() == [3, 77]
        assert fs[fr == 0] == pytest.approx([1.0, 1.0], abs=1e-5)

    def test_block_merge_equals_global(self):
        rng = np.random.default_rng(4)
        vecs = rng.standard_normal((300, 8)).astype(np.float32)
        ids = np.arange(300)
        q = ann.normalize_rows(rng.standard_normal((4, 8)).astype(np.float32))
        # global
        qi, vi, sc = ann.cosine_topk_block(vecs, ids, q, k=3)
        gq, gi, gs, gr = ann.merge_topk(qi, vi, sc, 3)
        # blocked
        parts = []
        for s in range(0, 300, 64):
            parts.append(ann.cosine_topk_block(vecs[s : s + 64], ids[s : s + 64], q, k=3))
        bq = np.concatenate([p[0] for p in parts])
        bi = np.concatenate([p[1] for p in parts])
        bs = np.concatenate([p[2] for p in parts])
        mq, mi, ms, mr = ann.merge_topk(bq, bi, bs, 3)
        np.testing.assert_array_equal(gi, mi)

    def test_lsh_bucket_deterministic(self):
        rng = np.random.default_rng(6)
        v = rng.standard_normal((50, 12)).astype(np.float32)
        p = ann.hyperplane_lsh_params(12, 16)
        assert np.array_equal(ann.hyperplane_bucket(v, p), ann.hyperplane_bucket(v, p))


class TestImage:
    def _img(self, rng, h=24, w=16):
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def test_png_lossless(self):
        rng = np.random.default_rng(8)
        img = self._img(rng)
        out = image.png_decode(image.png_encode(img))
        np.testing.assert_array_equal(out, img)

    def test_qnt_psnr_over_40(self):
        rng = np.random.default_rng(9)
        img = self._img(rng, 32, 32)
        out = image.qnt_decode(image.qnt_encode(img, bits=6))
        assert image.psnr(img, out) >= 40.0

    def test_raw_roundtrip(self):
        rng = np.random.default_rng(10)
        img = self._img(rng)
        np.testing.assert_array_equal(image.raw_decode(image.raw_encode(img)), img)

    def test_psnr_identical_inf(self):
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        assert image.psnr(img, img) == float("inf")

    def test_phash_similar_images_close(self):
        rng = np.random.default_rng(11)
        grad = np.linspace(0, 255, 64 * 64).reshape(64, 64)
        img = np.stack([grad, grad * 0.5, grad * 0.25], axis=2).astype(np.uint8)
        noisy = np.clip(img.astype(np.int16) + rng.integers(-6, 6, img.shape), 0, 255).astype(np.uint8)
        other = self._img(rng, 64, 64)
        h0, h1, h2 = image.phash64(img), image.phash64(noisy), image.phash64(other)
        from cov_tiles_ray.functions.dedup import hamming_distance64

        d_near = hamming_distance64(np.array([h0], dtype=np.uint64), np.array([h1], dtype=np.uint64))[0]
        d_far = hamming_distance64(np.array([h0], dtype=np.uint64), np.array([h2], dtype=np.uint64))[0]
        assert d_near < d_far

    def test_unknown_format_raises(self):
        with pytest.raises(NotImplementedError):
            image.decode_image(b"xx", "jpeg")


def test_hamming_at_most_matches_exact_popcount():
    """The branchless <=k prefilter must agree with the exact popcount on
    random u64 pairs and on the k-boundary exactly."""
    import numpy as np

    from cov_tiles_ray.functions.dedup import hamming_at_most, hamming_distance64

    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    # random pairs (far apart) plus engineered near pairs at 0..6 flipped bits
    flip = np.uint64(0)
    near_b = []
    for k in range(7):
        near_b.append(a[k] ^ flip)
        flip = (flip << np.uint64(1)) | np.uint64(1)
    a = np.concatenate([a, a[:7]])
    b = np.concatenate([b, np.array(near_b, dtype=np.uint64)])
    exact = hamming_distance64(a, b)
    for k in (0, 1, 3, 5):
        np.testing.assert_array_equal(hamming_at_most(a, b, k), exact <= k, err_msg=f"k={k}")
