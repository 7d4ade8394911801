"""Mask algebra and corruption tests (reference misc.py:388-402,
model.py:554-568, 1247-1262)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.game.masks import (assemble_loss_masks, build_mask,
                                           corrupt_message)
from multimodalgame_tpu.ops.sampling import bernoulli_sample, flipout, hard_round


def test_build_mask_regions():
    # "0:3,5" -> indices 0,1,2,5 (python-style ranges, misc.py:392-393)
    m = build_mask("0:3,5", 8)
    assert m.tolist() == [1, 1, 1, 0, 0, 1, 0, 0]
    m = build_mask("2", 4)
    assert m.tolist() == [0, 0, 1, 0]


def test_corrupt_message_flips_masked_bits():
    z = jnp.asarray([[1., 0., 1., 0.], [0., 0., 1., 1.]])
    mask = jnp.asarray(build_mask("1:3", 4))
    out = corrupt_message(z, mask)
    assert out.tolist() == [[1., 1., 0., 0.], [0., 1., 0., 1.]]


def test_flipout_statistics():
    key = jax.random.PRNGKey(0)
    binary = jnp.zeros((2000, 50))
    flipped = flipout(key, binary, 0.25)
    rate = float(flipped.mean())
    assert abs(rate - 0.25) < 0.01
    # Flipping ones gives zeros at the same rate.
    flipped1 = flipout(key, jnp.ones((2000, 50)), 0.25)
    assert abs(float(1 - flipped1.mean()) - 0.25) < 0.01


def test_bernoulli_and_round():
    key = jax.random.PRNGKey(1)
    probs = jnp.full((5000, 20), 0.7)
    s = bernoulli_sample(key, probs)
    assert set(np.unique(np.asarray(s))) <= {0.0, 1.0}
    assert abs(float(s.mean()) - 0.7) < 0.02
    assert hard_round(jnp.asarray([0.49, 0.5, 0.51])).tolist() == [0., 1., 1.]


def test_assemble_loss_masks_shapes_and_algebra():
    # Stop chain for B=3, T=3: example 0 stops at step 0, example 1 at
    # step 1, example 2 never (forced by the final zero mask).
    stop_masks = jnp.asarray([
        [[1.], [1.], [1.]],   # m_0 = ones padding
        [[0.], [1.], [1.]],   # after step 0
        [[0.], [0.], [1.]],   # after step 1
        [[0.], [0.], [0.]],   # after step 2 (forced zero)
    ])
    m = assemble_loss_masks(stop_masks)
    assert m.binary_s.shape == (3, 3, 1)
    assert m.binary_rec.shape == (2, 3, 1)
    np.testing.assert_array_equal(m.binary_s, stop_masks[:-1])
    np.testing.assert_array_equal(m.binary_rec, stop_masks[1:-1])
    # y-mask picks exactly the stopping step per example
    # (model.py:1261-1262): col sums to 1 (the reference's debug assert,
    # model.py:898-900).
    y = np.asarray(m.y)[:, :, 0]
    np.testing.assert_array_equal(y.sum(0), np.ones(3))
    assert y[0, 0] == 1 and y[1, 1] == 1 and y[2, 2] == 1
