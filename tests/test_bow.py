"""DBoW3 vocabulary loading + transform/scoring consistency tests."""

import os

import numpy as np
import pytest

from ppg_slam_tpu.bow import Vocabulary

VOC_PATH = "/root/reference/Vocabulary/voc_euroc_9x3.gz"
VOC_TUM = "/root/reference/Vocabulary/voc_tum_9x3.gz"

pytestmark = pytest.mark.skipif(not os.path.exists(VOC_PATH),
                                reason="reference vocabulary not available")

RNG = np.random.RandomState(41)


@pytest.fixture(scope="module")
def voc():
    return Vocabulary.load(VOC_PATH)


def unit_descs(n):
    d = RNG.randn(n, 256).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


class TestVocabulary:
    def test_structure(self, voc):
        assert voc.k == 9 and voc.L == 3
        assert voc.scoring == 1 and voc.weighting == 0  # L2_NORM, TF_IDF
        assert voc.n_words == 729
        assert voc.node_desc.shape == (820, 256)
        # every leaf reachable from root in exactly L steps
        depth = np.full(820, -1)
        depth[0] = 0
        for _ in range(4):
            for nid in range(1, 820):
                p = voc.node_parent[nid]
                if depth[p] >= 0:
                    depth[nid] = depth[p] + 1
        leaves = np.nonzero(voc.node_word >= 0)[0]
        assert (depth[leaves] == 3).all()
        # node descriptors are k-means centroids of unit vectors: sub-unit norm
        norms = np.linalg.norm(voc.node_desc[1:], axis=1)
        assert norms.min() > 0.1 and norms.max() <= 1.0

    def test_tum_vocabulary_loads(self):
        voc2 = Vocabulary.load(VOC_TUM)
        assert voc2.n_words == 729

    def test_transform_basic(self, voc):
        d = unit_descs(100)
        bow, fv = voc.transform(d)
        assert bow, "non-empty bow vector"
        norm = np.sqrt(sum(v * v for v in bow.values()))
        assert abs(norm - 1.0) < 1e-6
        # levelsup=4 > L=3 -> all features grouped under the root node
        assert list(fv.keys()) == [0]
        assert sorted(fv[0]) == list(range(100))

    def test_transform_word_is_nearest_leaf_greedy(self, voc):
        """Descent must pick argmin-distance child at each level."""
        d = unit_descs(5)
        bow, _ = voc.transform(d)
        for i in range(5):
            node = 0
            for _ in range(3):
                ch = voc.children[node]
                ch = ch[ch >= 0]
                dist = np.sum((voc.node_desc[ch] - d[i]) ** 2, 1)
                node = ch[np.argmin(dist)]
            w = voc.node_word[node]
            assert w >= 0

    def test_score_properties(self, voc):
        d1 = unit_descs(80)
        d2 = unit_descs(80)
        bv1, _ = voc.transform(d1)
        bv2, _ = voc.transform(d2)
        assert abs(voc.score(bv1, bv1) - 1.0) < 1e-6
        s12 = voc.score(bv1, bv2)
        assert 0.0 <= s12 <= 1.0
        assert abs(voc.score(bv1, bv2) - voc.score(bv2, bv1)) < 1e-9
        # similar frames (subset) score higher than random ones
        bv3, _ = voc.transform(np.concatenate([d1[:60], unit_descs(20)]))
        assert voc.score(bv1, bv3) > s12
