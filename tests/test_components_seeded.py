"""Seeded label propagation: labels + closeness in one pass vs oracle."""

import jax.numpy as jnp
import numpy as np

from vofod_tpu.ops.components import SENTINEL, label_components_seeded

from oracles import euclidean_clusters_np


class TestSeededLabels:
    def test_reached_and_labels_match_oracle(self, rng):
        for _ in range(6):
            occ = rng.random((9, 11, 13)) < 0.10
            seed = (rng.random((9, 11, 13)) < 0.03) & occ
            labels, reached, conv, _ = label_components_seeded(
                jnp.asarray(occ), jnp.asarray(seed), 3.0, 64
            )
            assert bool(conv)
            got_lab = np.asarray(labels)
            got_reach = np.asarray(reached)
            want_lab, ncomp = euclidean_clusters_np(occ, 3.0)
            seed_comps = set(want_lab[seed])
            want_reach = np.isin(want_lab, list(seed_comps)) & occ
            np.testing.assert_array_equal(got_reach, want_reach)
            # labels form the same partition on UNREACHED (far) voxels
            far = occ & ~want_reach
            seen = {}
            for z, y, x in zip(*np.nonzero(far)):
                g, w = got_lab[z, y, x], want_lab[z, y, x]
                assert seen.setdefault(g, w) == w, "label split a component"
            # distinct oracle components -> distinct labels
            assert len(set(seen.values())) == len(seen)
            assert (got_lab[~occ] == int(SENTINEL)).all()

    def test_far_label_prioritizes_high_z(self, rng):
        occ = np.zeros((8, 8, 8), bool)
        occ[2, 2, 2] = occ[2, 2, 3] = True  # one small component, no seeds
        labels, reached, conv, _ = label_components_seeded(
            jnp.asarray(occ), jnp.zeros_like(jnp.asarray(occ)), 3.0, 16
        )
        nv = 8 * 8 * 8
        # label = reversed flat id of the max-flat-id member (2,2,3)
        want = (nv - 1) - ((2 * 8 + 2) * 8 + 3)
        assert int(np.asarray(labels)[2, 2, 2]) == want
        assert int(np.asarray(labels)[2, 2, 3]) == want
        assert not np.asarray(reached).any()
        # a higher-z component gets a SMALLER label than a lower-z one
        occ2 = np.zeros((8, 8, 8), bool)
        occ2[1, 1, 1] = True   # low z
        occ2[6, 6, 6] = True   # high z (separate component)
        labels2, _, _, _ = label_components_seeded(
            jnp.asarray(occ2), jnp.zeros_like(jnp.asarray(occ2)), 3.0, 16
        )
        assert int(np.asarray(labels2)[6, 6, 6]) < int(np.asarray(labels2)[1, 1, 1])

    def test_cc_iters_tracks_scene_complexity(self):
        """cc_iters is a real diagnostic: a single voxel converges in one
        sweep; a long chain needs ~length/radius sweeps; hitting the cap
        reports max_iters with converged=False."""
        occ1 = np.zeros((4, 4, 32), bool)
        occ1[1, 1, 5] = True
        _, _, conv1, it1 = label_components_seeded(
            jnp.asarray(occ1), jnp.zeros((4, 4, 32), bool), 1.0, 8
        )
        assert bool(conv1) and int(it1) <= 1

        occ2 = np.zeros((4, 4, 32), bool)
        occ2[1, 1, :] = True  # 32-long chain, radius 1 -> ~31 sweeps
        _, _, conv2, it2 = label_components_seeded(
            jnp.asarray(occ2), jnp.zeros((4, 4, 32), bool), 1.0, 64
        )
        assert bool(conv2)
        assert int(it2) > int(it1)
        assert 28 <= int(it2) <= 32

        _, _, conv3, it3 = label_components_seeded(
            jnp.asarray(occ2), jnp.zeros((4, 4, 32), bool), 1.0, 8
        )
        assert not bool(conv3)
        assert int(it3) == 8
