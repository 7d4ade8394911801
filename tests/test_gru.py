"""GRU-cell math parity against torch.nn.GRUCell (the reference Receiver's
recurrence, model.py:256)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_matches_torch_grucell():
    import torch

    from multimodalgame_tpu.models.gru import TorchGRUCell

    in_dim, hid = 6, 5
    torch.manual_seed(0)
    ref = torch.nn.GRUCell(in_dim, hid)

    cell = TorchGRUCell(in_dim, hid)
    params = cell.init(jax.random.PRNGKey(0), jnp.zeros((1, in_dim)),
                       jnp.zeros((1, hid)))["params"]
    # Copy torch weights (transpose torch's (3H, in) stacking).
    params = {
        "w_ih": jnp.asarray(ref.weight_ih.detach().numpy().T),
        "w_hh": jnp.asarray(ref.weight_hh.detach().numpy().T),
        "b_ih": jnp.asarray(ref.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(ref.bias_hh.detach().numpy()),
    }

    rng = np.random.RandomState(0)
    x = rng.randn(3, in_dim).astype(np.float32)
    h = rng.randn(3, hid).astype(np.float32)

    ours = cell.apply({"params": params}, jnp.asarray(x), jnp.asarray(h))
    theirs = ref(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_init_distribution():
    """Xavier-normal over the *stacked* fan (reference model.py:281-288):
    std = sqrt(2 / (in + 3H)); biases zero."""
    from multimodalgame_tpu.models.gru import TorchGRUCell

    in_dim, hid = 64, 128
    cell = TorchGRUCell(in_dim, hid)
    params = cell.init(jax.random.PRNGKey(1), jnp.zeros((1, in_dim)),
                       jnp.zeros((1, hid)))["params"]
    expect = np.sqrt(2.0 / (in_dim + 3 * hid))
    got = float(np.asarray(params["w_ih"]).std())
    assert abs(got - expect) / expect < 0.1
    assert float(np.abs(np.asarray(params["b_ih"])).max()) == 0.0
