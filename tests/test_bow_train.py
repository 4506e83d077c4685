"""Vocabulary creation tests (bow/train.py vs the reference trainBow tool +
DBoW3 Vocabulary::create/save semantics)."""

import numpy as np
import pytest

from ppg_slam_tpu.bow import Vocabulary
from ppg_slam_tpu.bow.train import (create_vocabulary, save_vocabulary,
                                    _descend)


def make_clustered_features(n_images=20, n_clusters=30, per_image=50, seed=3):
    """Synthetic descriptor sets drawn around well-separated cluster
    centers (L2-normalized like real PPG descriptors)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, 256).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    feats = []
    for _ in range(n_images):
        idx = rng.randint(n_clusters, size=per_image)
        d = centers[idx] + 0.05 * rng.randn(per_image, 256).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        feats.append(d)
    return feats


@pytest.fixture(scope="module")
def voc_and_feats():
    feats = make_clustered_features()
    voc = create_vocabulary(feats, k=4, L=3, seed=0)
    return voc, feats


class TestCreate:
    def test_tree_shape(self, voc_and_feats):
        voc, _ = voc_and_feats
        assert voc.k == 4 and voc.L == 3
        assert 4 < voc.n_words <= 4 ** 3
        # every non-root node's parent has it as a child
        for nid in range(1, len(voc.node_parent)):
            p = voc.node_parent[nid]
            assert nid in voc.children[p]

    def test_words_are_leaves(self, voc_and_feats):
        voc, _ = voc_and_feats
        for nid in range(1, len(voc.node_parent)):
            is_leaf = (voc.children[nid] < 0).all()
            assert (voc.node_word[nid] >= 0) == is_leaf

    def test_idf_weights(self, voc_and_feats):
        voc, feats = voc_and_feats
        w = voc.node_weight[voc.node_word >= 0]
        assert (w >= 0).all()
        # a word seen in every image has weight ln(N/N)=0; rare words > 0
        assert w.max() > 0

    def test_deterministic(self):
        feats = make_clustered_features(n_images=5)
        v1 = create_vocabulary(feats, k=3, L=2, seed=7)
        v2 = create_vocabulary(feats, k=3, L=2, seed=7)
        np.testing.assert_array_equal(v1.node_desc, v2.node_desc)
        np.testing.assert_array_equal(v1.node_word, v2.node_word)

    def test_transform_self_consistent(self, voc_and_feats):
        voc, feats = voc_and_feats
        bow1, _ = voc.transform(feats[0])
        bow2, _ = voc.transform(feats[1])
        assert voc.score(bow1, bow1) == pytest.approx(1.0, abs=1e-6)
        assert 0.0 <= voc.score(bow1, bow2) <= 1.0

    def test_descend_matches_transform(self, voc_and_feats):
        voc, feats = voc_and_feats
        leaves = _descend(voc, feats[0])
        words = voc.node_word[leaves]
        bow, _ = voc.transform(feats[0])
        assert set(int(w) for w in words if w >= 0
                   and voc.node_weight[leaves[list(words).index(w)]] > 0) \
            <= set(bow.keys()) | {int(w) for w in words}


class TestSaveLoad:
    def test_roundtrip(self, voc_and_feats, tmp_path):
        voc, feats = voc_and_feats
        path = str(tmp_path / "voc_test.bin")
        save_vocabulary(voc, path)
        loaded = Vocabulary.load(path)
        assert loaded.k == voc.k and loaded.L == voc.L
        assert loaded.n_words == voc.n_words
        np.testing.assert_array_equal(loaded.node_parent, voc.node_parent)
        np.testing.assert_allclose(loaded.node_desc, voc.node_desc,
                                   atol=1e-6)
        np.testing.assert_allclose(loaded.node_weight, voc.node_weight,
                                   atol=1e-12)
        np.testing.assert_array_equal(loaded.node_word, voc.node_word)
        # transforms agree exactly
        b1, f1 = voc.transform(feats[0])
        b2, f2 = loaded.transform(feats[0])
        assert b1.keys() == b2.keys()
        for w in b1:
            assert b1[w] == pytest.approx(b2[w], abs=1e-7)

    def test_loader_compat_with_shipped_header(self, tmp_path):
        """The writer's header layout matches what the .gz loader expects."""
        feats = make_clustered_features(n_images=4, per_image=20)
        voc = create_vocabulary(feats, k=3, L=2, seed=1)
        path = str(tmp_path / "voc_hdr.bin")
        save_vocabulary(voc, path)
        raw = open(path, "rb").read()
        import struct
        sig, = struct.unpack_from("<Q", raw, 0)
        assert sig == 88877711233
        assert raw[8] == 0  # uncompressed
        nnodes, = struct.unpack_from("<I", raw, 9)
        assert nnodes == len(voc.node_parent)
